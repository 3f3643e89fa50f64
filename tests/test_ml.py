"""Invariant/property tests for the non-SQL-expressible operators
(SURVEY.md §5.2): normalizers, alignment, imaging, PCA, KMeans,
DBSCAN, K-Shape, DTW.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _ragged_series(spark, n_series=12, seed=7):
    """Deterministic ragged multi-series fixture (FIXTURES.md F1)."""
    rng = np.random.default_rng(seed)
    rows = []
    for sid in range(n_series):
        length = int(rng.integers(30, 60))
        base = rng.standard_normal()
        for t in range(length):
            rows.append((sid, t, float(math.sin(t / 5 + base) + 0.1 * rng.standard_normal())))
    return spark.createDataFrame(rows, "series_id long, t long, value double")


# --- normalization ---------------------------------------------------------

def test_global_normalization_invariants(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.prep import with_global_normalized

    df = with_global_normalized(_ragged_series(spark))
    agg = df.agg(
        F.min("min_max"), F.max("min_max"), F.avg("z_score"), F.stddev_pop("z_score")
    ).collect()[0]
    assert agg[0] == pytest.approx(0.0)
    assert agg[1] == pytest.approx(1.0)
    assert agg[2] == pytest.approx(0.0, abs=1e-9)
    assert agg[3] == pytest.approx(1.0, abs=1e-9)


# --- alignment -------------------------------------------------------------

def test_truncation_padding_invariants(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import align, stats

    df = _ragged_series(spark)
    lens = {r["series_id"]: r["length"] for r in stats.series_lengths(df).collect()}
    lo, hi = min(lens.values()), max(lens.values())

    t_lens = stats.series_lengths(align.truncate_to_min(df)).collect()
    assert all(r["length"] == lo for r in t_lens)

    padded = align.pad_to_max(df)
    p_lens = stats.series_lengths(padded).collect()
    assert all(r["length"] == hi for r in p_lens)
    # padding suffix all zero
    sfx = padded.join(
        spark.createDataFrame([(k, v) for k, v in lens.items()], "series_id long, orig long"),
        "series_id",
    ).where(F.col("t") >= F.col("orig"))
    assert sfx.where(F.col("value") != 0.0).count() == 0


def test_sliding_window_count_and_content(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.align import sliding_windows

    L, w, s = 100, 10, 3
    one = spark.createDataFrame(
        [(0, t, float(t)) for t in range(L)], "series_id long, t long, value double"
    )
    out = sliding_windows(one, w, s)
    n_windows = out.select("window_id").distinct().count()
    assert n_windows == (L - w) // s + 1  # drop_remainder (app.py:287)
    # each window is exactly the slice [wid*s, wid*s + w)
    bad = out.where(F.col("value") != F.col("window_id") * s + F.col("pos")).count()
    assert bad == 0
    assert out.groupBy("window_id").count().where(F.col("count") != w).count() == 0


def test_dtw_align_invariants(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import align, stats

    df = _ragged_series(spark)
    out = align.dtw_stretch_align(df)
    max_len = stats.series_lengths(df).agg(F.max("length")).collect()[0][0]
    out_lens = stats.series_lengths(out).collect()
    assert all(r["length"] == max_len for r in out_lens)
    # the longest series passes through unchanged (identity branch)
    longest_id = sorted(
        stats.series_lengths(df).collect(), key=lambda r: (-r["length"], r["series_id"])
    )[0]["series_id"]
    orig = {
        r["t"]: r["value"]
        for r in df.where(F.col("series_id") == longest_id).collect()
    }
    got = {
        r["t"]: r["value"]
        for r in out.where(F.col("series_id") == longest_id).collect()
    }
    assert got == pytest.approx(orig)


def test_pca_powerit_recovers_principal_subspace(spark):
    """e2c is a PCA, not just a deterministic ritual: on data with a
    planted dominant direction, the twin's x scores must correlate
    ~perfectly with the true first principal component's scores (up to
    sign), and x must carry more variance than y."""
    from the_framework_for_clustering_time_series_data_spark.operators import embed

    rng = np.random.default_rng(11)
    n, d = 300, 8
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([10.0, 4.0, 1.0, 0.5, 0.3, 0.2, 0.1, 0.05])
    X = rng.normal(size=(n, d)) * scales @ basis.T
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = (
        embed.pca_powerit_det(df)
        .orderBy("series_id")
        .collect()
    )
    got_x = np.array([r["x"] for r in out])
    got_y = np.array([r["y"] for r in out])
    Xc = X - X.mean(axis=0)
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    ref1 = Xc @ vt[0]
    ref2 = Xc @ vt[1]
    assert abs(np.corrcoef(got_x, ref1)[0, 1]) > 0.999
    assert abs(np.corrcoef(got_y, ref2)[0, 1]) > 0.99
    assert got_x.var() > got_y.var()


def test_e3b_spectral_separates_clusters(spark, tmp_path):
    """e3b embeds neighborhood structure, not just a deterministic
    ritual: two well-separated blobs must come out linearly separable
    on the first diffusion coordinate (the kNN graph is two
    near-disconnected components, so the first non-trivial eigenvector
    splits them by sign)."""
    import numpy as np

    from the_framework_for_clustering_time_series_data_spark.plans.ml_plans import e3b_spectral_md5

    rng = np.random.default_rng(5)
    pts = []
    for b in range(2):
        center = np.zeros(64)
        center[: 8] = 10.0 * b
        for i in range(30):
            pts.append((b * 30 + i, [float(x) for x in center + rng.normal(scale=0.5, size=64)], b))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>, label int")
    sf = str(tmp_path / "sfX")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    out = {r["series_id"]: r["x"] for r in e3b_spectral_md5(spark, sf).collect()}
    xs0 = [out[i] for i in range(30)]
    xs1 = [out[i] for i in range(30, 60)]
    # one blob strictly positive, the other strictly negative
    s0, s1 = np.sign(np.median(xs0)), np.sign(np.median(xs1))
    assert s0 != 0 and s1 != 0 and s0 == -s1
    assert all(np.sign(v) == s0 for v in xs0)
    assert all(np.sign(v) == s1 for v in xs1)


def test_kshape_md5_short_series_lag_overlap_guard(spark):
    """Series shorter than max_lag+1 (round-6 ADVICE): the degenerate
    overlap (start > stop) must yield cc = 0 — NOT a descending
    sequence whose out-of-range element_at nulls the NCC — matching
    the DuckDB twin's empty range(). Every series must come back
    assigned with a non-null finite ncc."""
    from the_framework_for_clustering_time_series_data_spark.operators import cluster

    rows = [
        ("s1", [1.0, 2.0, 3.0]),
        ("s2", [3.0, 1.0, 2.0]),
        ("s3", [2.0, 3.0, 1.0]),
        ("s4", [1.0, 3.0, 2.0]),
    ]
    nested = spark.createDataFrame(rows, "series_id string, values array<double>")
    out = cluster.kshape_md5_assign(nested, k=2, max_lag=4, rounds=2).collect()
    assert len(out) == 4
    for r in out:
        assert r["ncc"] is not None and math.isfinite(r["ncc"])
        assert r["cell"] in (0, 1)


def test_dtw_path_is_valid_warping():
    from the_framework_for_clustering_time_series_data_spark.operators.align import _dtw_path

    a = np.array([0.0, 1.0, 2.0, 3.0])
    b = np.array([0.0, 0.5, 1.0, 2.0, 2.5, 3.0])
    path = _dtw_path(a, b)
    assert path[0] == (0, 0) and path[-1] == (len(a) - 1, len(b) - 1)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}
    # identical series → diagonal path
    diag = _dtw_path(a, a)
    assert diag == [(i, i) for i in range(len(a))]


# --- imaging ---------------------------------------------------------------

def test_rp_gaf_matrix_properties(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import align, imaging

    df = _ragged_series(spark, n_series=2)
    nested = align.to_nested(df)
    rp = imaging.recurrence_plot(nested).collect()
    for row in rp:
        m = np.asarray(row["image"])
        assert m.shape[0] == m.shape[1]
        assert (m == m.T).all()  # symmetry
        assert (np.diag(m) == 0).all()  # |v_i - v_i| = 0
        assert m.min() >= 0 and m.max() == 255  # scaled to full range

    gaf = imaging.gramian_angular_field(nested).collect()
    for row in gaf:
        m = np.asarray(row["image"])
        assert m.shape[0] == m.shape[1]
        assert np.allclose(m, m.T, atol=1e-9)
        assert m.min() >= 0 - 1e-9 and m.max() <= 255 + 1e-9


def test_resize_shapes(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import align, imaging

    df = _ragged_series(spark, n_series=3)
    images = imaging.recurrence_plot(align.to_nested(df))
    for size in (16, 64):
        out = imaging.resize_images(images, size).collect()
        for row in out:
            m = np.asarray(row["image"])
            assert m.shape == (size, size)
            assert m.min() >= 0 and m.max() <= 255


# --- embedding -------------------------------------------------------------

def test_pca_matches_numpy_covariance_eigen(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import align, embed

    df = _ragged_series(spark, n_series=10)
    nested = align.to_nested(align.truncate_to_min(df))
    out, var_pct = embed.embedding_pca(nested, k=2)
    rows = out.orderBy("series_id").collect()
    got = np.array([[r["x"], r["y"]] for r in rows])

    pdf = nested.orderBy("series_id").toPandas()
    X = np.vstack(pdf["values"].to_numpy())
    Xc = X - X.mean(axis=0)
    cov = (Xc.T @ Xc) / (X.shape[0] - 1)
    w_, v_ = np.linalg.eigh(cov)
    order = np.argsort(w_)[::-1]
    # MLlib projects the UNcentered data onto principal axes
    expect = X @ v_[:, order[:2]]
    for dim in range(2):
        same = np.allclose(got[:, dim], expect[:, dim], atol=1e-6)
        flipped = np.allclose(got[:, dim], -expect[:, dim], atol=1e-6)
        assert same or flipped
    assert 0 < sum(var_pct) <= 100.1


def test_autoencoder_trains_and_is_deterministic(spark):
    """The AE must actually LEARN (best reconstruction MSE strictly
    below the first epoch's), embed every series to finite 2-D
    coordinates, not collapse the latent to a point, and reproduce the
    same embedding for the same seed."""
    from the_framework_for_clustering_time_series_data_spark.operators import align, embed, imaging

    df = _ragged_series(spark, n_series=4)
    images = imaging.recurrence_plot(align.to_nested(df))
    losses: list = []
    out = sorted(
        map(tuple, embed.embedding_autoencoder(images, img_size=16, loss_out=losses).collect())
    )
    assert len(out) == 4
    assert all(np.isfinite(r[1]) and np.isfinite(r[2]) for r in out)
    first, best = losses
    assert best < first, f"no learning: first={first} best={best}"
    xs = {r[1] for r in out} | {r[2] for r in out}
    assert len(xs) > 1, "latent collapsed to a single point"
    again = sorted(map(tuple, embed.embedding_autoencoder(images, img_size=16).collect()))
    assert out == again


def test_conv_autoencoder_variant_same_invariants(spark):
    """The Conv2D-faithful variant (arch='conv': the reference's
    stride-2 conv encoder stack via im2col) must satisfy the SAME
    invariants as the dense arch — learning, finite non-collapsed
    latent, determinism. Latent coordinates differ between archs by
    design (documented in _conv_autoencoder)."""
    from the_framework_for_clustering_time_series_data_spark.operators import align, embed, imaging

    df = _ragged_series(spark, n_series=4)
    images = imaging.recurrence_plot(align.to_nested(df))
    losses: list = []
    out = sorted(
        map(
            tuple,
            embed.embedding_autoencoder(
                images, img_size=16, epochs=120, loss_out=losses, arch="conv"
            ).collect(),
        )
    )
    assert len(out) == 4
    assert all(np.isfinite(r[1]) and np.isfinite(r[2]) for r in out)
    first, best = losses
    assert best < first, f"no learning: first={first} best={best}"
    xs = {r[1] for r in out} | {r[2] for r in out}
    assert len(xs) > 1, "latent collapsed to a single point"
    again = sorted(
        map(
            tuple,
            embed.embedding_autoencoder(images, img_size=16, epochs=120, arch="conv").collect(),
        )
    )
    assert out == again


# --- clustering ------------------------------------------------------------

def _blobs(spark, n_per=30, seed=3):
    """4 well-separated Gaussian blobs + 5 far outliers (FIXTURES F3)."""
    rng = np.random.default_rng(seed)
    centers = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    rows = []
    sid = 0
    truth = {}
    for ci, (cx, cy) in enumerate(centers):
        for _ in range(n_per):
            rows.append((sid, float(cx + 0.3 * rng.standard_normal()), float(cy + 0.3 * rng.standard_normal())))
            truth[sid] = ci
            sid += 1
    for i in range(5):
        rows.append((sid, 100.0 + 7 * i, -50.0 - 11 * i))
        truth[sid] = -1
        sid += 1
    return spark.createDataFrame(rows, "series_id long, x double, y double"), truth


def _ari(labels_a: dict, labels_b: dict) -> float:
    """Adjusted Rand index (public formula), label-permutation-proof."""
    ids = sorted(labels_a)
    a = [labels_a[i] for i in ids]
    b = [labels_b[i] for i in ids]
    from collections import Counter

    n = len(ids)
    ab = Counter(zip(a, b))
    ca, cb = Counter(a), Counter(b)
    comb = lambda x: x * (x - 1) / 2
    sum_ab = sum(comb(c) for c in ab.values())
    sum_a = sum(comb(c) for c in ca.values())
    sum_b = sum(comb(c) for c in cb.values())
    exp = sum_a * sum_b / comb(n)
    mx = (sum_a + sum_b) / 2
    return (sum_ab - exp) / (mx - exp) if mx != exp else 1.0


def test_kmeans_recovers_blobs(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmeans_fit_predict

    emb, truth = _blobs(spark)
    emb = emb.where(F.col("series_id") < 120)  # blobs only
    out, centers = kmeans_fit_predict(emb, k=4, seed=10)
    got = {r["series_id"]: r["prediction"] for r in out.collect()}
    assert _ari(got, {k: v for k, v in truth.items() if v != -1}) == pytest.approx(1.0)
    assert len(centers) == 4


def test_dbscan_blobs_and_outliers(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import dbscan

    emb, truth = _blobs(spark)
    out = dbscan(emb, eps=1.5, min_samples=5)
    got = {r["series_id"]: r["prediction"] for r in out.collect()}
    # exact outlier set
    assert {i for i, p in got.items() if p == -1} == {i for i, t in truth.items() if t == -1}
    # clusters match blob membership up to permutation
    core = {i: p for i, p in got.items() if p != -1}
    assert _ari(core, {i: t for i, t in truth.items() if t != -1}) == pytest.approx(1.0)
    assert len(set(core.values())) == 4


def test_dbscan_min_samples_boundary(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import dbscan

    # 4 points in a tight line, eps covers neighbors: with min_samples=5
    # nobody is core → all noise; with 3 → one cluster
    pts = spark.createDataFrame(
        [(i, float(i) * 0.1, 0.0) for i in range(4)], "series_id long, x double, y double"
    )
    all_noise = dbscan(pts, eps=0.5, min_samples=5).collect()
    assert all(r["prediction"] == -1 for r in all_noise)
    one_cluster = dbscan(pts, eps=0.5, min_samples=3).collect()
    assert all(r["prediction"] == 0 for r in one_cluster)


def test_silhouette_exact_against_numpy(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import silhouette_exact

    emb, truth = _blobs(spark, n_per=15)
    pred = emb.join(
        spark.createDataFrame(
            [(k, v if v != -1 else 4) for k, v in truth.items()],
            "series_id long, prediction int",
        ),
        "series_id",
    )
    rows = silhouette_exact(pred).orderBy("series_id").collect()

    pts = {r["series_id"]: (r["x"], r["y"]) for r in emb.collect()}
    ids = sorted(pts)
    X = np.array([pts[i] for i in ids])
    lab = np.array([truth[i] if truth[i] != -1 else 4 for i in ids])
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    expect = []
    for i in range(len(ids)):
        own = lab == lab[i]
        own[i] = False
        a = D[i][own].mean() if own.any() else None
        bs = [D[i][lab == c].mean() for c in set(lab) if c != lab[i]]
        b = min(bs) if bs else None
        expect.append(0.0 if a is None or b is None else (b - a) / max(a, b))
    got = [r["silhouette"] for r in rows]
    assert got == pytest.approx(expect, abs=1e-9)


def test_kshape_separates_shapes(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import align
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kshape

    # two shape families: sine vs square-ish, varying phase/amplitude
    rng = np.random.default_rng(11)
    rows = []
    truth = {}
    L = 64
    for sid in range(16):
        fam = sid % 2
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.5, 2.0)
        for t in range(L):
            val = (
                amp * math.sin(2 * np.pi * t / L + phase)
                if fam == 0
                else amp * (1.0 if (t / L * 4 + phase) % 2 < 1 else -1.0)
            )
            rows.append((sid, t, float(val + 0.05 * rng.standard_normal())))
        truth[sid] = fam
    df = spark.createDataFrame(rows, "series_id long, t long, value double")
    out = kshape(align.to_nested(df), k=2, seed=0)
    got = {r["series_id"]: r["prediction"] for r in out.collect()}
    assert _ari(got, truth) == pytest.approx(1.0)


def test_umap_fallback_preserves_neighborhoods(spark):
    """Without umap-learn (this env) the fallback is Laplacian
    Eigenmaps: two well-separated groups of series must land in two
    separated regions of the embedding (between-group distances exceed
    within-group ones)."""
    from the_framework_for_clustering_time_series_data_spark.operators import align, embed

    rows = []
    for sid in range(8):
        base = 0.0 if sid < 4 else 50.0
        for t in range(12):
            rows.append((sid, t, base + 0.1 * ((sid * 7 + t) % 5)))
    df = spark.createDataFrame(rows, "series_id long, t long, value double")
    nested = align.to_nested(df)
    emb = {
        r["series_id"]: (r["x"], r["y"])
        for r in embed.embedding_umap(nested, n_components=2, n_neighbors=3).collect()
    }

    def dist(a, b):
        return ((emb[a][0] - emb[b][0]) ** 2 + (emb[a][1] - emb[b][1]) ** 2) ** 0.5

    within = max(dist(a, b) for g in ([0, 1, 2, 3], [4, 5, 6, 7]) for a in g for b in g if a < b)
    between = min(dist(a, b) for a in (0, 1, 2, 3) for b in (4, 5, 6, 7))
    assert between > within, f"groups not separated: between={between} within={within}"


def test_umap_or_standin(spark):
    """With umap-learn installed: real UMAP. Without (this env): the
    deterministic Laplacian-Eigenmaps fallback — same contract,
    deterministic across invocations."""
    from the_framework_for_clustering_time_series_data_spark.operators import align, embed

    df = _ragged_series(spark, n_series=4)
    nested = align.to_nested(align.truncate_to_min(df))
    out = embed.embedding_umap(nested, n_components=2, seed=0)
    rows = {r["series_id"]: (r["x"], r["y"]) for r in out.collect()}
    assert len(rows) == 4
    # deterministic across invocations
    again = {
        r["series_id"]: (r["x"], r["y"])
        for r in embed.embedding_umap(nested, n_components=2, seed=0).collect()
    }
    assert rows == again


def test_bisecting_kmeans_recovers_blobs(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import bisecting_kmeans_fit_predict

    emb, truth = _blobs(spark)
    emb = emb.where(F.col("series_id") < 120)  # blobs only
    out, centers = bisecting_kmeans_fit_predict(emb, k=4, seed=10)
    got = {r["series_id"]: r["prediction"] for r in out.collect()}
    assert _ari(got, {k: v for k, v in truth.items() if v != -1}) == pytest.approx(1.0)
    assert len(centers) == 4


def test_gmm_recovers_blobs_with_confident_posteriors(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import gmm_fit_predict

    emb, truth = _blobs(spark)
    emb = emb.where(F.col("series_id") < 120)
    out = gmm_fit_predict(emb, k=4, seed=10).collect()
    got = {r["series_id"]: r["prediction"] for r in out}
    assert _ari(got, {k: v for k, v in truth.items() if v != -1}) > 0.95
    # well-separated blobs → near-certain posteriors
    assert sum(r["confidence"] > 0.99 for r in out) > 0.9 * len(out)


def test_power_iteration_separates_two_cliques(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import power_iteration_clusters

    # two dense cliques of DIFFERENT sizes joined by one weak bridge:
    # PIC's 1-D embedding assigns each component a plateau whose value
    # depends on local mixing rate, so isomorphic cliques (identical
    # plateaus) are its documented degenerate case — asymmetric sizes
    # are the realistic near-duplicate-community shape anyway
    edges = [(a, b, 0.9) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b, 0.9) for a in range(10, 18) for b in range(a + 1, 18)]
    edges += [(4, 10, 0.02)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long, jaccard double")
    out = power_iteration_clusters(pairs, k=2, max_iter=20).collect()
    by_cluster: dict[int, set] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["id"])
    assert sorted((frozenset(v) for v in by_cluster.values()), key=min) == [
        frozenset(range(5)),
        frozenset(range(10, 18)),
    ]


def test_tfidf_kmeans_groups_exact_duplicates(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import text as text_ops
    from pyspark.ml.clustering import KMeans

    texts = [
        "spark shuffles data between stages using hash partitioning",
        "parquet stores columns with run length and dictionary encoding",
        "gradient descent minimizes loss over many training epochs",
    ]
    rows = [(i * 10 + j, t) for i, t in enumerate(texts) for j in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = text_ops.tfidf_vectors(df, min_doc_freq=0)
    model = KMeans(k=3, seed=10, featuresCol="features", predictionCol="prediction").fit(vecs)
    out = model.transform(vecs).collect()
    by_topic: dict[int, set] = {}
    for r in out:
        by_topic.setdefault(r["id"] // 10, set()).add(r["prediction"])
    # identical docs always co-cluster; distinct topics get distinct clusters
    assert all(len(v) == 1 for v in by_topic.values())
    assert len({next(iter(v)) for v in by_topic.values()}) == 3


def test_quality_classifier_separates_weak_labels(spark):
    """The distilled classifier must rank heuristic-good docs above
    heuristic-bad ones (sanity: it learned the signal it was taught)
    and score every document."""
    from the_framework_for_clustering_time_series_data_spark.operators.text import quality_classifier_scores
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = quality_classifier_scores(docs).cache()
    assert out.count() == docs.count()
    means = {
        r.weak_label: r.m
        for r in out.groupBy("weak_label").agg(F.avg("quality_prob").alias("m")).collect()
    }
    assert means[1] > 0.7, means
    assert means[0] < 0.3, means
    assert means[0] < means.get(-1, 0.5) < means[1], means


def test_quality_logit_det_ranks_labels(spark):
    """The deterministic GD twin is calibration-poor by construction
    (8 fixed rounds, no standardization) but must RANK the weak labels
    near-perfectly: AUC(good vs bad) >= 0.95 and the class means must
    order good > unlabeled > bad. Cross-engine value parity is the
    oracle suite's job; this pins that the fixed schedule actually
    learns the signal."""
    from the_framework_for_clustering_time_series_data_spark.operators.text import quality_logit_det
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = quality_logit_det(docs).cache()
    assert out.count() == docs.count()
    rows = out.where(F.col("weak_label") >= 0).collect()
    good = sorted(r.quality_prob for r in rows if r.weak_label == 1)
    bad = sorted(r.quality_prob for r in rows if r.weak_label == 0)
    import bisect

    # AUC via rank counting (ties get half credit)
    wins = sum(bisect.bisect_left(bad, g) for g in good)
    ties = sum(
        bisect.bisect_right(bad, g) - bisect.bisect_left(bad, g) for g in good
    )
    auc = (wins + 0.5 * ties) / (len(good) * len(bad))
    assert auc >= 0.95, auc
    means = {
        r.weak_label: r.m
        for r in out.groupBy("weak_label").agg(F.avg("quality_prob").alias("m")).collect()
    }
    assert means[0] < means.get(-1, (means[0] + means[1]) / 2) < means[1], means


def test_kmedoids_recovers_blobs_deterministically(spark):
    # three tight, well-separated 2-D blobs: farthest-point init puts
    # one seed per blob, PAM converges to the exact partition, medoids
    # are actual members, and a re-run reproduces the result bit-for-bit
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmedoids

    rows = []
    centers = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    sid = 0
    truth = {}
    for ci, (cx, cy) in enumerate(centers):
        for j in range(8):
            rows.append((sid, cx + 0.1 * (j % 3), cy + 0.1 * (j // 3)))
            truth[sid] = ci
            sid += 1
    emb = spark.createDataFrame(rows, "series_id long, x double, y double")
    out = {r["series_id"]: r for r in kmedoids(emb, k=3).collect()}
    assert len(out) == len(rows)
    by_truth = {}
    for s, ci in truth.items():
        by_truth.setdefault(ci, set()).add(out[s]["prediction"])
    assert all(len(v) == 1 for v in by_truth.values())
    assert len({next(iter(v)) for v in by_truth.values()}) == 3
    medoids = [s for s, r in out.items() if r["is_medoid"]]
    assert len(medoids) == 3
    assert all(m in truth for m in medoids)
    again = {r["series_id"]: tuple(r) for r in kmedoids(emb, k=3).collect()}
    assert again == {s: tuple(r) for s, r in out.items()}


def test_kmedoids_center_is_member_under_outlier(spark):
    # one blob plus a far outlier, k=2: k-medoids' centers stay actual
    # members — the blob's medoid sits IN the blob (a k-means centroid
    # of the same data would be dragged off all members)
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmedoids

    rows = [(i, float(i % 4), float(i // 4)) for i in range(12)]
    rows.append((99, 1000.0, 1000.0))
    emb = spark.createDataFrame(rows, "series_id long, x double, y double")
    out = {r["series_id"]: r for r in kmedoids(emb, k=2).collect()}
    blob_preds = {out[i]["prediction"] for i in range(12)}
    assert len(blob_preds) == 1  # the blob stays whole
    assert out[99]["prediction"] not in blob_preds  # outlier isolated
    medoids = {s for s, r in out.items() if r["is_medoid"]}
    assert 99 in medoids  # singleton cluster is its own medoid
    assert len(medoids - {99}) == 1 and (medoids - {99}) <= set(range(12))


def test_single_link_chains_and_gaps(spark):
    # a chain of points 0.9 apart links end-to-end at d=1.0 (the
    # chaining property single-link is DEFINED by, which k-means and
    # DBSCAN-with-min-samples both break), while a 5-unit gap splits;
    # singletons keep their own cluster id
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import single_link

    rows = [(i, i * 0.9, 0.0) for i in range(6)]            # chain A: 0..5
    rows += [(10 + i, 100.0 + i * 0.9, 0.0) for i in range(4)]  # chain B
    rows.append((99, 500.0, 500.0))                          # singleton
    emb = spark.createDataFrame(rows, "series_id long, x double, y double")
    out = {r["series_id"]: r for r in single_link(emb, d=1.0).collect()}
    assert len(out) == len(rows)
    assert {out[i]["cluster"] for i in range(6)} == {0}
    assert {out[10 + i]["cluster"] for i in range(4)} == {10}
    assert out[99]["cluster"] == 99 and out[99]["cluster_size"] == 1
    assert out[0]["cluster_size"] == 6 and out[10]["cluster_size"] == 4
    # at a tighter cut the chain shatters into singletons
    tight = {r["series_id"]: r["cluster"] for r in single_link(emb, d=0.5).collect()}
    assert all(tight[i] == i for i in range(6))


def test_kmedoids_max_iter_exhaustion_labels_consistent(spark):
    # max_iter=1 forces the exhaustion exit: the final assignment must
    # be recomputed against the FINAL medoid set, so no prediction maps
    # to NULL through the relabel map and is_medoid agrees with the
    # cluster labels (round-1 advice: the old code advanced medoid_ids
    # after computing assign, leaving them out of sync)
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmedoids

    rows = [(i, float(i % 5) * 3.0, float(i // 5) * 3.0) for i in range(20)]
    emb = spark.createDataFrame(rows, "series_id long, x double, y double")
    out = kmedoids(emb, k=4, max_iter=1).collect()
    assert len(out) == 20
    assert all(r["prediction"] is not None for r in out)
    # every medoid's own prediction is the label its id maps to, and
    # each cluster contains exactly one medoid
    by_pred = {}
    for r in out:
        by_pred.setdefault(r["prediction"], []).append(r)
    for pred, members in by_pred.items():
        assert sum(1 for m in members if m["is_medoid"]) == 1, (pred, members)


def test_kmedoids_k_exceeding_points_clamps(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmedoids

    rows = [(0, 0.0, 0.0), (1, 5.0, 0.0), (2, 0.0, 5.0)]
    emb = spark.createDataFrame(rows, "series_id long, x double, y double")
    out = kmedoids(emb, k=10).collect()
    assert len(out) == 3
    # every point its own medoid; labels distinct; none NULL
    assert all(r["is_medoid"] for r in out)
    assert len({r["prediction"] for r in out}) == 3
    assert all(r["prediction"] is not None for r in out)


def test_single_link_rejects_nonpositive_threshold(spark):
    import pytest as _pytest

    from the_framework_for_clustering_time_series_data_spark.operators.cluster import single_link

    emb = spark.createDataFrame([(0, 0.0, 0.0)], "series_id long, x double, y double")
    with _pytest.raises(ValueError, match="single_link"):
        single_link(emb, d=0.0)
    with _pytest.raises(ValueError, match="single_link"):
        single_link(emb, d=-1.0)


def test_kmedoids_clara_recovers_blobs_and_is_deterministic(spark):
    # CLARA (sampled PAM + full-corpus scoring) must recover the same
    # well-separated blobs as exact PAM, keep medoids actual members,
    # and reproduce bit-for-bit on a re-run
    import random

    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmedoids

    rng = random.Random(7)
    centers = [(0.0, 0.0), (12.0, 0.0), (0.0, 12.0)]
    rows, truth = [], {}
    for i in range(300):
        ci = i % 3
        rows.append(
            (i, centers[ci][0] + rng.gauss(0, 0.8), centers[ci][1] + rng.gauss(0, 0.8))
        )
        truth[i] = ci
    emb = spark.createDataFrame(rows, "series_id long, x double, y double")
    out = {r["series_id"]: r for r in kmedoids(emb, k=3, method="clara").collect()}
    by_truth = {}
    for s, ci in truth.items():
        by_truth.setdefault(ci, set()).add(out[s]["prediction"])
    assert all(len(v) == 1 for v in by_truth.values()), by_truth
    assert len({next(iter(v)) for v in by_truth.values()}) == 3
    medoids = {s for s, r in out.items() if r["is_medoid"]}
    assert len(medoids) == 3
    again = {r["series_id"]: tuple(r) for r in kmedoids(emb, k=3, method="clara").collect()}
    assert again == {s: tuple(r) for s, r in out.items()}


def test_kmedoids_clara_scales_to_100k_points(spark):
    # the scale path: 100k points must cluster in linear broadcast
    # passes (PAM's quadratic per-cluster update would not finish) —
    # bound generously to absorb machine-load variance
    import random
    import time

    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmedoids

    rng = random.Random(1)
    centers = [(0.0, 0.0), (14.0, 14.0), (-11.0, 15.0)]
    rows = [
        (
            i,
            centers[i % 3][0] + rng.gauss(0, 1.5),
            centers[i % 3][1] + rng.gauss(0, 1.5),
        )
        for i in range(100_000)
    ]
    emb = spark.createDataFrame(rows, "series_id long, x double, y double")
    t0 = time.time()
    out = kmedoids(emb, k=3, method="clara")
    counts = {r["prediction"]: r["n"] for r in out.groupBy("prediction").agg(F.count("*").alias("n")).collect()}
    elapsed = time.time() - t0
    assert sum(counts.values()) == 100_000
    # every blob holds one third of the mass (±2%)
    assert all(abs(n - 33334) < 2000 for n in counts.values()), counts
    assert elapsed < 120, f"CLARA took {elapsed:.0f}s on 100k points"


def test_area_downsample_equals_relational_box_mean(spark):
    # the nested-HOF operator and the rp_long groupBy formulation (the
    # registered i3b plan) must agree cell-for-cell; also: dropping the
    # ragged tail (10 % 3 -> 3x3 output over the first 9)
    from the_framework_for_clustering_time_series_data_spark.operators import imaging

    vals = [float((i * 37) % 11) for i in range(10)]
    nested = spark.createDataFrame([(1, vals)], "series_id long, values array<double>")
    small = imaging.area_downsample(imaging.recurrence_plot(nested), 3)
    got = small.collect()[0]["image"]
    assert len(got) == 3 and all(len(r) == 3 for r in got)
    px = imaging.rp_long(nested)
    rel = {
        (r["i"], r["j"]): r["v"]
        for r in px.where((F.col("i") < 9) & (F.col("j") < 9))
        .groupBy(
            F.floor(F.col("i") / 3).cast("int").alias("i"),
            F.floor(F.col("j") / 3).cast("int").alias("j"),
        )
        .agg(F.round(F.sum("pixel") / 9.0, 6).alias("v"))
        .collect()
    }
    for i in range(3):
        for j in range(3):
            assert got[i][j] == rel[(i, j)], (i, j)


def test_deterministic_lloyd_recovers_blobs(spark):
    """The md5-seeded fixed-round Lloyd twin must separate
    well-separated blobs as cleanly as the MLlib fit (ARI 1.0 needs
    luck with only 2 fixed rounds and arbitrary seeds, so assert a
    strong-agreement floor), and be exactly reproducible run to run."""
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import deterministic_lloyd_assign

    emb, truth = _blobs(spark)
    emb = emb.where(F.col("series_id") < 120)
    v = emb.select("series_id", F.array("x", "y").alias("v"))
    out = deterministic_lloyd_assign(v, 4, id_col="series_id", vec_col="v",
                                     lloyd_rounds=4)
    got = {r["id"]: r["cell"] for r in out.collect()}
    truth_b = {k: t for k, t in truth.items() if t != -1}
    assert _ari(got, truth_b) > 0.6
    again = {r["id"]: r["cell"] for r in
             deterministic_lloyd_assign(v, 4, id_col="series_id",
                                        vec_col="v", lloyd_rounds=4).collect()}
    assert got == again


def test_bisecting_lloyd_recovers_blobs(spark):
    """Deterministic bisecting on 4 well-separated blobs (k=4 → 3
    splits) must recover the blob structure with strong agreement and
    reproduce exactly across runs."""
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import bisecting_lloyd_assign

    emb, truth = _blobs(spark)
    emb = emb.where(F.col("series_id") < 120)
    v = emb.select("series_id", F.array("x", "y").alias("v"))
    out = bisecting_lloyd_assign(v, 4, id_col="series_id", vec_col="v")
    got = {r["id"]: r["lab"] for r in out.collect()}
    truth_b = {k: t for k, t in truth.items() if t != -1}
    assert _ari(got, truth_b) > 0.6
    again = {r["id"]: r["lab"] for r in
             bisecting_lloyd_assign(v, 4, id_col="series_id", vec_col="v").collect()}
    assert got == again


def test_isotonic_mllib_matches_exact_minimax(spark):
    # MLlib's distributed PAV (per-partition pools merged) must land on
    # the same fit as the exact minimax identity — an independent
    # whole-implementation check of the production calibrator — and
    # both fits must be monotone in the score
    from tests.conftest import SF_ORACLE
    from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

    exact = {
        round(r["x"], 6): r["iso_p"]
        for r in QUERIES["ml_isotonic_minimax"](spark, SF_ORACLE).collect()
    }
    mllib = {
        round(r["x"], 6): r["iso_p"]
        for r in QUERIES["ml_isotonic"](spark, SF_ORACLE).collect()
    }
    assert set(mllib) == set(exact)
    assert max(abs(mllib[x] - exact[x]) for x in mllib) <= 1e-6
    ps = [p for _, p in sorted(exact.items())]
    assert all(ps[i] <= ps[i + 1] + 1e-12 for i in range(len(ps) - 1))


def test_umap_primary_branch_plumbing_with_injected_module(spark, monkeypatch):
    """Round-9 verdict ask #5: umap-learn is absent in this container,
    so the PRIMARY branch of embedding_umap (collect → umap.UMAP fit →
    distributed frame) was never executed in CI — only the spectral
    fallback. Execute it by injecting a minimal stand-in module with
    the real fit_transform signature: this verifies OUR side of the
    contract (the documented app.py:661-667 constructor params
    init='random'/random_state=seed, the column wiring, the output
    shaping) — NOT umap itself, which needs the real library. With
    umap-learn installed the other umap tests exercise the genuine fit
    through the same branch."""
    import sys
    import types

    import numpy as np

    from the_framework_for_clustering_time_series_data_spark.operators import align, embed

    seen = {}

    class _FakeUMAP:
        def __init__(self, **kw):
            seen.update(kw)

        def fit_transform(self, X):
            X = np.asarray(X, dtype=float)
            # deterministic, shape-correct stand-in embedding
            return np.stack([X.mean(axis=1), X.std(axis=1)], axis=1)

    fake = types.ModuleType("umap")
    fake.UMAP = _FakeUMAP
    monkeypatch.setitem(sys.modules, "umap", fake)

    df = _ragged_series(spark, n_series=5)
    nested = align.to_nested(align.truncate_to_min(df))
    out = embed.embedding_umap(nested, n_components=2, n_neighbors=3, seed=7)
    rows = {r["series_id"]: (r["x"], r["y"]) for r in out.collect()}
    assert set(out.columns) == {"series_id", "x", "y"}
    assert len(rows) == 5
    # the documented reference-parity constructor contract reached umap
    assert seen["init"] == "random" and seen["random_state"] == 7
    assert seen["n_components"] == 2 and seen["n_neighbors"] == 3
    # values came from the injected fit (mean/std of each series)
    pdf = nested.select("series_id", "values").toPandas()
    for _, r in pdf.iterrows():
        v = np.asarray(r["values"], dtype=float)
        got = rows[r["series_id"]]
        assert abs(got[0] - v.mean()) < 1e-12 and abs(got[1] - v.std()) < 1e-12


def test_power_iteration_disk_edge_path_matches_memory_path(spark):
    """The sf100 heap-wall lever (round-11 verdict ask #1): above
    disk_edge_rows the PIC edge frame persists DISK_ONLY instead of a
    memory-backed localCheckpoint. Forcing the disk path
    (disk_edge_rows=0) must yield the identical partition on the
    two-clique fixture."""
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import power_iteration_clusters

    edges = [(a, b, 0.9) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b, 0.9) for a in range(10, 18) for b in range(a + 1, 18)]
    edges += [(4, 10, 0.02)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long, jaccard double")

    def groups(disk_edge_rows: int):
        out = power_iteration_clusters(
            pairs, k=2, max_iter=20, disk_edge_rows=disk_edge_rows
        ).collect()
        by_cluster: dict[int, set] = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], set()).add(r["id"])
        return sorted((frozenset(v) for v in by_cluster.values()), key=min)

    expected = [frozenset(range(5)), frozenset(range(10, 18))]
    assert groups(disk_edge_rows=0) == expected  # forced disk path
    assert groups(disk_edge_rows=10**6) == expected  # memory path
