"""Embedding (dimensionality-reduction) operators (reference E1-E4,
/root/reference/app.py:490-691).

E2 PCA — Spark MLlib (distributed covariance + local eigen); the
workhorse, deterministic up to component sign.
E3 UMAP — driver-side fit (umap-learn if importable), distributed
transform; gated stub otherwise.
E1 Autoencoder — the reference trains Keras on imaged series. TF is
not in this environment, so training is a clearly-marked deterministic
stand-in encoder; the Spark-side pipeline (image → resize → latent
extraction via pandas UDF) is real and tested, and swaps to a real
model by replacing ``_encode_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_vectors(nested: DataFrame, values_col: str = "values") -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return nested.withColumn("_features", array_to_vector(F.col(values_col)))


def embedding_pca(
    nested: DataFrame, k: int = 2, values_col: str = "values"
) -> tuple[DataFrame, list[float]]:
    """E2 — PCA to k dims over equal-length series
    (app.py:677-691; reference fits PCA(10) for explained-variance
    display plus PCA(2)/PCA(3) for coordinates).

    Returns (DataFrame(series_id, x, y[, z]), explained_variance_pcts).
    MLlib PCA: one pass for the Gramian (distributed), eigen on the
    driver (d×d, tiny) — scales in n, not in n².
    """
    from pyspark.ml.feature import PCA

    vecs = _to_vectors(nested, values_col)
    model = PCA(k=k, inputCol="_features", outputCol="_pca").fit(vecs)
    var_pct = [round(float(v) * 100, 1) for v in model.explainedVariance]
    out = model.transform(vecs)
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("_pca"))
    coords = [arr[i].alias(c) for i, c in zip(range(k), ("x", "y", "z"))]
    return out.select("series_id", *coords), var_pct


def embedding_umap(
    nested: DataFrame,
    n_components: int = 2,
    n_neighbors: int = 50,
    min_dist: float = 0.1,
    seed: int = 0,
    values_col: str = "values",
) -> DataFrame:
    """E3 — UMAP embed (app.py:661-667: init='random', random_state=0).

    umap-learn is a driver-side fit by nature; if it isn't installed
    (this environment), fall back to a clearly-marked DETERMINISTIC
    STAND-IN — a seeded Gaussian random projection to k dims evaluated
    JVM-side (broadcast weights, zip_with/aggregate dot products) — so
    the distributed contract (nested series in → (series_id, x, y)
    out) stays real and testable. The surrounding plumbing
    (collect → fit → distributed transform) is the shape a real
    deployment uses.
    """
    try:
        import umap  # noqa: F401
    except ImportError:  # pragma: no cover - env-dependent
        return _random_projection_standin(
            nested, k=n_components, seed=seed, values_col=values_col
        )
    import numpy as np

    pdf = nested.select("series_id", values_col).toPandas()
    X = np.vstack(pdf[values_col].to_numpy())
    reducer = umap.UMAP(
        n_components=n_components,
        n_neighbors=n_neighbors,
        min_dist=min_dist,
        init="random",
        random_state=seed,
    )
    emb = reducer.fit_transform(X)
    spark = nested.sparkSession
    cols = ["x", "y", "z"][:n_components]
    out = pdf[["series_id"]].copy()
    for i, c in enumerate(cols):
        out[c] = emb[:, i].astype(float)
    return spark.createDataFrame(out)


def _random_projection_standin(
    nested: DataFrame, k: int = 2, seed: int = 0, values_col: str = "values"
) -> DataFrame:
    """STAND-IN for UMAP when umap-learn is absent: seeded Gaussian
    random projection R^L → R^k (Johnson-Lindenstrauss style — preserves
    pairwise distances approximately, which is the property downstream
    clustering needs). NOT UMAP semantics; swap in umap-learn for
    reference behavior.

    The projection runs entirely JVM-side: weight rows are array
    literals (broadcast with the plan), each output coordinate is a
    zip_with product + aggregate sum — no Python in the hot path.
    """
    import numpy as np

    first = nested.select(F.size(values_col).alias("L")).first()
    if first is None:
        cols = [F.lit(0.0).alias(c) for c in ("x", "y", "z")[:k]]
        return nested.select("series_id", *cols)
    L = first["L"]
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(k, L)) / np.sqrt(L)

    def proj(row: "np.ndarray") -> F.Column:
        w = F.array(*[F.lit(float(v)) for v in row])
        prods = F.zip_with(F.col(values_col), w, lambda a, b: a * b)
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    cols = [proj(W[i]).alias(c) for i, c in enumerate(("x", "y", "z")[:k])]
    return nested.select("series_id", *cols)


def embedding_autoencoder(
    images: DataFrame,
    img_size: int = 64,
    image_col: str = "image",
) -> DataFrame:
    """E1 — autoencoder latent extraction (app.py:490-641).

    The reference trains a Conv2D stride-2 encoder to a 2-D latent.
    TensorFlow is unavailable here, so ``_encode_batch`` is a
    DETERMINISTIC STAND-IN (not a trained model): latent = (mean of
    the upper triangle, mean of the lower triangle) of the resized
    image, scaled to [0,1]. The distributed pipeline — resize →
    Arrow-batched encode over mapInPandas → (series_id, x, y) — is the
    real contract; swap ``_encode_batch`` for a broadcast Keras model
    to restore reference behavior.
    """
    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.imaging import resize_images

    resized = resize_images(images, img_size, image_col)

    def _encode_batch(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                m = np.stack([np.asarray(r, dtype=np.float64) for r in row["image"]]) / 255.0
                iu = np.triu_indices(m.shape[0], k=1)
                il = np.tril_indices(m.shape[0], k=-1)
                out.append(
                    {
                        "series_id": row["series_id"],
                        "x": float(m[iu].mean()) if iu[0].size else float(m.mean()),
                        "y": float(m[il].mean()) if il[0].size else float(m.mean()),
                    }
                )
            yield pd.DataFrame(out, columns=["series_id", "x", "y"])

    return resized.mapInPandas(_encode_batch, schema="series_id long, x double, y double")
