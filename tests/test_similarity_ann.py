"""ANN recall tests: LSH and IVF approximate top-k must recover most of
the exact brute-force neighbors on the embeddings test table."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from the_framework_for_clustering_time_series_data_spark.operators import similarity
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["nbr_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    qs = emb.where(F.col("vec_id") < 20)
    exact = _topk_sets(similarity.brute_force_topk(emb, qs, k=5))
    approx = _topk_sets(similarity.ivf_topk(emb, qs, k=5, n_cells=16, nprobe=4))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, f"IVF recall {hits}/{total}"


def test_ivf_deterministic(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    qs = emb.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, similarity.ivf_topk(emb, qs, k=3).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(emb, qs, k=3).collect()))
    assert a == b
