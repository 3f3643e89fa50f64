"""Similarity-search plans over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from the_framework_for_clustering_time_series_data_spark.operators import similarity
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


@register(
    "sim_bruteforce_topk",
    """
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS nbr_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id != q.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
  FROM scored
)
SELECT query_id, nbr_id, cosine, rank FROM r WHERE rank <= 5
""",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors (vec_id < 10): broadcast
    queries × one corpus scan; JVM-side zip_with/aggregate dot product.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register("sim_ann_lsh_topk")  # driver-seeded hyperplanes → rows-only oracle
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via multi-probe random-hyperplane LSH (6
    planes × 8 tables, 1-bit probing, seed 42): candidates =
    same-bucket pairs only — the scale path where brute force is
    O(n²). Recall vs brute force asserted in
    tests/test_similarity_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


@register("sim_ivf_topk")  # KMeans index build → rows-only oracle
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF partitioning (16 KMeans cells, probe
    4): queries only score their nprobe nearest cells — the classic
    inverted-file ANN index expressed as a cell equi-join (recall vs
    brute force asserted in tests/test_similarity_ann.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, n_cells=16, nprobe=4
    )


@register("sim_ivf_persisted_topk")  # KMeans index build + disk layout → rows-only oracle
def sim_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 against a PERSISTED IVF index: the corpus is
    written hive-partitioned by nearest-centroid cell plus a centroid
    metadata table, then probed via a broadcast cell join that
    dynamic-partition-prunes the scan to the 4 probed cells. Same
    results as sim_ivf_topk (asserted in tests/test_similarity_ann.py);
    this entry exercises the build→persist→probe serving path."""
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="the_framework_for_clustering_time_series_data_spark_ivf_")
    similarity.build_ivf_index(emb, path, n_cells=16)
    return similarity.ivf_probe_index(
        spark, path, emb.where(F.col("vec_id") < 10), k=5, nprobe=4
    )
