"""Count-min sketch primitives (Cormode & Muthukrishnan, J.Alg'05),
shared by the batch heavy-hitters plan (plans/event_plans.py:
d3_countmin_heavy_hitters) and its streaming twin
(streaming/ops.streaming_countmin_sketch).

The affine-modular hash family is chosen so BOTH engines (Spark and
the DuckDB oracle) evaluate the sketch exactly — integer multiply/add/
mod only — which is what buys d3 its full value-hash oracle, rare for
a sketch. One definition here keeps the two consumers and the oracle
SQL in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_P = 2147483647  # 2^31 - 1 (Mersenne prime)
CMS_HASHES = ((2654435761, 1), (40503, 977), (69069, 7919), (1103515245, 12345))
CMS_W = 64


def cms_bucket(key: Column, a: Column, b: Column) -> Column:
    """Row-``i`` bucket of ``key``: ((key·a + b) mod P) mod W."""
    return (key * a + b) % CMS_P % CMS_W


def cms_hash_dim(df_or_spark) -> DataFrame:
    """The d-row hash dimension (i, a, b) — constant broadcast fan-out."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(CMS_HASHES)], "i int, a long, b long"
    )


def cms_sketch(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """The d×w counter table ``(row_i, bucket, c)`` in one aggregate
    pass — d·w is a CONSTANT (256 counters), independent of key
    cardinality, so as a streaming aggregation its state never grows
    (the fixed-size mergeable-summary property that makes sketches the
    canonical unbounded-stream statistic). Works identically on batch
    and streaming frames."""
    hashes = cms_hash_dim(df)
    bucket = cms_bucket(F.col(key_col), F.col("a"), F.col("b"))
    return (
        df.select(F.col(key_col))
        .crossJoin(F.broadcast(hashes))
        .groupBy(F.col("i").alias("row_i"), bucket.alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
