"""Wall-clock resampling operators over an event stream: time-bucket
rollup, dense-grid gap-fill (LOCF), and linear interpolation — the
hypertable surface of a time-series store (the reference only
re-indexes to row ordinals, /root/reference/app.py:204-217).

All pure DataFrame compositions: bucketing is ``date_trunc``, grids are
``sequence``+``explode`` (fan-out from ONE row per series, so grid size
scales with time span, not event count), carry-forward / interpolation
are IGNORE NULLS window picks on the grid's own partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_rollup(
    ev: DataFrame,
    unit: str = "hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Observed per-(series, bucket) averages: (series_id, bucket, v_avg).
    One shuffle on the composite key with map-side partials."""
    return (
        ev.groupBy(
            F.col(key_col).alias("series_id"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.avg(value_col).alias("v_avg"))
    )


def dense_grid(buckets: DataFrame, step: str = "INTERVAL 1 HOUR") -> DataFrame:
    """Dense per-series bucket grid spanning [first, last] observed
    bucket, left-joined with observations (missing buckets → null
    v_avg). The explode fans out from one span row per series."""
    span = buckets.groupBy("series_id").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = span.select(
        "series_id",
        F.explode(F.sequence(F.col("b0"), F.col("b1"), F.expr(step))).alias("bucket"),
    )
    return grid.join(buckets, ["series_id", "bucket"], "left")


def gapfill_locf(grid: DataFrame) -> DataFrame:
    """Fill missing buckets by last-observation-carried-forward: an
    IGNORE NULLS running ``last`` over the grid's series partitioning —
    one window stage, no extra shuffle after the grid join."""
    w = Window.partitionBy("series_id").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return grid.select(
        "series_id",
        "bucket",
        F.round(F.last("v_avg", ignorenulls=True).over(w), 6).alias("v_locf"),
        F.col("v_avg").isNull().alias("is_gap"),
    )


def interpolate_linear(grid: DataFrame) -> DataFrame:
    """Linearly interpolate missing buckets between the previous and
    next OBSERVED bucket (IGNORE NULLS window picks in both directions
    on one partitioning). Grid edges are always observed, so every gap
    has both neighbors.

    Interpolated values are dyadic rationals, so exact .5 ties at the
    6th decimal are common; Spark rounds HALF_UP, DuckDB HALF_EVEN.
    Rounding goes through an explicit floor identity so the double
    arithmetic is bitwise-identical across engines (oracle parity).

    Both neighbor picks run as RUNNING frames ([unboundedPreceding,
    CURRENT] — the next-observed pick over DESCENDING bucket order,
    an identity: first non-null ahead ascending == last non-null seen
    descending). Spark streams running frames in O(n) per partition,
    but evaluates [CURRENT, unboundedFollowing] frames by rescanning
    the remaining frame per row — O(n²) in the series length, which a
    year-long 100-TB hypertable grid would pay per series. Cost here:
    one extra in-partition sort (desc) on the SAME shuffle.
    """
    wp = Window.partitionBy("series_id").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = (
        Window.partitionBy("series_id")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    observed_bucket = F.when(F.col("v_avg").isNotNull(), F.col("bucket"))
    pv = F.last("v_avg", ignorenulls=True).over(wp)
    pb = F.last(observed_bucket, ignorenulls=True).over(wp)
    nv = F.last("v_avg", ignorenulls=True).over(wn)
    nb = F.last(observed_bucket, ignorenulls=True).over(wn)
    frac = (F.col("bucket").cast("double") - pb.cast("double")) / (
        nb.cast("double") - pb.cast("double")
    )
    lerp = pv + (nv - pv) * frac
    half_up = F.floor(F.coalesce(F.col("v_avg"), lerp) * 1e6 + 0.5) / 1e6
    return grid.select(
        "series_id",
        "bucket",
        half_up.alias("v_interp"),
        F.col("v_avg").isNull().alias("is_gap"),
    )


def lttb_downsample(
    buckets: DataFrame,
    threshold: int = 20,
    series_col: str = "series_id",
    bucket_col: str = "bucket",
    value_col: str = "v_avg",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    per series: reduce each series to ``threshold`` visually
    representative points — endpoints always kept, each interior bucket
    contributes the point with the largest triangle area against the
    previously kept point and the next bucket's centroid.

    The selection is sequential per series (each pick depends on the
    previous), so it runs as ``applyInPandas`` over the series key —
    the same one-exchange pattern as the Holt recursion; a series'
    rollup always fits a partition by construction (it is bounded by
    time span, not event count). This is the reference's
    plot-rendering path (app.py:1734, 2253 plot raw series wholesale)
    made scale-safe: a dashboard over 100 TB renders O(threshold)
    points per series, not O(n).
    """
    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.corpus_guard import id_spark_type

    # schema follows the input: bucket may be a timestamp (daily
    # rollup) or a plain ordinal (pipeline t); series ids may be
    # strings (sliding-window synthetic ids)
    sid_t = id_spark_type(buckets, series_col)
    bucket_t = id_spark_type(buckets, bucket_col)
    out_schema = f"{series_col} {sid_t}, {bucket_col} {bucket_t}, v double, pick int"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col).reset_index(drop=True)
        n = len(pdf)
        y = pdf[value_col].to_numpy(dtype=float)
        x = pdf[bucket_col].astype("int64").to_numpy(dtype=float)  # ns epoch
        if n <= threshold:
            idx = list(range(n))
        else:
            idx = [0]
            # n-2 interior points into threshold-2 equal buckets
            edges = np.linspace(1, n - 1, threshold - 1).astype(int)
            for b in range(threshold - 2):
                lo, hi = edges[b], edges[b + 1]
                nxt_lo, nxt_hi = edges[b + 1], (
                    edges[b + 2] if b + 2 < len(edges) else n
                )
                ax, ay = x[idx[-1]], y[idx[-1]]
                # sequential left-to-right sum/len, NOT np.mean: numpy
                # switches to pairwise summation at >=8 elements, which
                # differs from the DuckDB oracle's running-sum
                # list_aggregate at the ulp level and can flip the
                # argmax pick on near-tie areas for long series
                w = nxt_hi - nxt_lo
                cx = sum(x[nxt_lo:nxt_hi].tolist()) / w
                cy = sum(y[nxt_lo:nxt_hi].tolist()) / w
                seg_x, seg_y = x[lo:hi], y[lo:hi]
                area = np.abs(
                    (ax - cx) * (seg_y - ay) - (ax - seg_x) * (ay - cy)
                )
                idx.append(lo + int(area.argmax()))
            idx.append(n - 1)
        out = pdf.iloc[idx][[series_col, bucket_col, value_col]].rename(
            columns={value_col: "v"}
        )
        out["v"] = out["v"].round(6)
        out["pick"] = np.arange(len(idx), dtype="int32")
        return out

    from the_framework_for_clustering_time_series_data_spark.operators.grouped import grouped_apply

    # partition-batched: per-group work here is a 20-point selection,
    # so per-group UDF-call overhead would dominate (see grouped.py)
    return grouped_apply(buckets, [series_col], pick, out_schema)
