"""Cleaning / projection / normalization operators (reference P1-P5,
/root/reference/app.py:156-236, 358-382).

Reference semantics preserved exactly:
  * normalization is GLOBAL over the whole value column, computed before
    any per-series split (app.py:187-192) — one scale for all series;
  * z-score uses POPULATION stddev (NumPy ddof=0 default, app.py:373-382);
  * rows with null value are dropped first (app.py:184).

Scale note: global min/max/mean/stddev are computed with a full
``agg`` (map-side partial aggregation, one tiny shuffle) and joined
back via ``crossJoin(broadcast(...))`` — NOT an empty-partition window,
which would funnel every row through a single task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_null_values(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P1 — null filter (app.py:184)."""
    return df.na.drop(subset=[value_col])


def with_global_normalized(
    df: DataFrame,
    value_col: str = "value",
    minmax_col: str = "min_max",
    zscore_col: str = "z_score",
) -> DataFrame:
    """P3 + P4 — append global min-max and z-score columns.

    min_max = (x - min) / (max - min)            (app.py:358-368)
    z_score = (x - mean) / stddev_pop            (app.py:373-382)

    Degenerate input (constant column → zero range/std) yields 0.0
    rather than the reference's NaN/inf (and rather than an ANSI-mode
    divide-by-zero error).
    """
    stats = df.agg(
        F.min(value_col).alias("_vmin"),
        F.max(value_col).alias("_vmax"),
        F.avg(value_col).alias("_vavg"),
        F.stddev_pop(value_col).alias("_vstd"),
    )
    v = F.col(value_col)
    rng = F.col("_vmax") - F.col("_vmin")
    mm = F.when(rng != 0, (v - F.col("_vmin")) / rng).otherwise(F.lit(0.0))
    zs = F.when(F.col("_vstd") != 0, (v - F.col("_vavg")) / F.col("_vstd")).otherwise(
        F.lit(0.0)
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(minmax_col, mm)
        .withColumn(zscore_col, zs)
        .drop("_vmin", "_vmax", "_vavg", "_vstd")
    )


def preprocess_table(df: DataFrame) -> DataFrame:
    """P5 — the reference's ``Preprocess.csv`` export table
    ``(Process, Value, z_score, min_max)`` per input row
    (app.py:194-236), over long-form ``(series_id, t, value)``.
    """
    out = with_global_normalized(drop_null_values(df))
    return out.select(
        F.col("series_id").alias("process"),
        F.col("t"),
        F.col("value"),
        F.col("z_score"),
        F.col("min_max"),
    )
