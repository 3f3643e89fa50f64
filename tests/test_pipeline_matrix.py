"""The reference advertises 4 preprocessing × 3 embedding × 3
clustering = 36 pipeline combinations (README.md:18; SURVEY.md §0).
This suite runs EVERY combination end-to-end through the facade on a
tiny ragged synthetic corpus — the parity statement that any workflow a
reference user runs today has a working Spark path here.
"""

from __future__ import annotations

import math

import pytest

from the_framework_for_clustering_time_series_data_spark.pipeline import TimeSeriesPipeline

ALIGNS = ("truncation", "padding", "dtw", "sliding")
EMBEDS = ("pca", "umap", "autoencoder")
CLUSTERS = ("kmeans", "dbscan", "kshape")


@pytest.fixture(scope="module")
def ragged_long(spark):
    # 8 ragged series in two obvious shape families (sine vs ramp),
    # lengths 18..25 so truncate/pad/DTW genuinely differ
    rows = []
    for sid in range(8):
        n = 18 + sid
        for t in range(n):
            base = (
                math.sin(2 * math.pi * t / 8.0)
                if sid % 2 == 0
                else t / float(n)
            )
            rows.append((sid, t, base + 0.01 * ((sid * 7 + t) % 5)))
    return spark.createDataFrame(rows, "series_id long, t long, value double")


@pytest.mark.parametrize("align_method", ALIGNS)
@pytest.mark.parametrize("embed_method", EMBEDS)
@pytest.mark.parametrize("cluster_method", CLUSTERS)
def test_pipeline_combination(spark, ragged_long, align_method, embed_method, cluster_method):
    pipe = TimeSeriesPipeline(spark).load_long(ragged_long)
    pipe.preprocess()
    pipe.align(align_method, window_size=8, shift_size=4)
    pipe.embed(embed_method, img_size=16)
    pred = pipe.cluster(cluster_method, k=2, eps=1.5, min_samples=2)
    rows = pred.collect()
    assert rows, f"{align_method}/{embed_method}/{cluster_method}: no predictions"
    n_series = pipe.embedding.count() if cluster_method != "kshape" else None
    labels = {r["prediction"] for r in rows}
    # every series got a label; label space is small-int (and -1 only
    # as DBSCAN's outlier marker)
    assert all(r["prediction"] >= -1 for r in rows)
    if cluster_method == "dbscan":
        assert len(rows) == n_series
    elif cluster_method == "kmeans":
        assert len(rows) == n_series
        assert labels <= {0, 1}
    # representatives/centroids derive without error wherever the
    # embedding drove the clustering
    if cluster_method != "kshape":
        assert pipe.centroids().count() >= 1
        assert pipe.representatives().count() >= 1
