"""Scalar statistics operators (reference A1-A4,
/root/reference/app.py:1037-1048, 1706-1710) and per-series length
statistics (G2, app.py:221-232).

All pure built-in aggregates: map-side partial aggregation, single
shuffle on the grouping key (or none for global aggs), whole-stage
codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rms(col) -> "F.Column":
    """A2 — root-mean-square, sqrt(mean(x^2)) (app.py:1037-1048)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(F.avg(F.pow(c, F.lit(2))))


def value_stats(df: DataFrame, value_col: str = "value") -> DataFrame:
    """A1 — the stats panel: min, max, mean, population variance, RMS
    (app.py:1706-1710; note np.var ddof=0 → ``var_pop``).
    """
    v = F.col(value_col)
    return df.agg(
        F.round(F.min(v), 6).alias("v_min"),
        F.round(F.max(v), 6).alias("v_max"),
        F.round(F.avg(v), 6).alias("v_mean"),
        F.round(F.var_pop(v), 6).alias("v_var"),
        F.round(rms(v), 6).alias("v_rms"),
    )


def series_lengths(df: DataFrame) -> DataFrame:
    """Per-series point count over long form — the grouped-length table
    feeding G2/G3/G4.
    """
    return df.groupBy("series_id").agg(F.count("*").alias("length"))


def length_stats(df: DataFrame) -> DataFrame:
    """G2 — min/max/mean of per-series lengths (app.py:221-232)."""
    return series_lengths(df).agg(
        F.min("length").alias("len_min"),
        F.max("length").alias("len_max"),
        F.round(F.avg("length"), 6).alias("len_mean"),
        F.count("*").alias("n_series"),
    )
