"""Time-bucket resampling, gap-filling, interpolation, and decayed
aggregation over the ``events`` stream table — the hypertable-rollup
surface of a time-series engine (the reference only ever re-indexes to
row ordinals, /root/reference/app.py:204-217; a production time-series
store needs wall-clock bucketing with explicit gap semantics).

All five plans are pure DataFrame compositions (no UDFs): bucketing is
``date_trunc``, grids are ``sequence``+``explode``, carry-forward /
interpolation are IGNORE NULLS window picks, decay is a running-sum
identity — every stage stays inside whole-stage codegen and shuffles at
most once per series key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.operators import resample
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


def _hourly_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly dense grid over the events table (shared plan input)."""
    ev = load_table(spark, sf_dir, "events")
    return resample.dense_grid(resample.bucket_rollup(ev, unit="hour"))


# Shared oracle CTEs for the grid-based plans.
_GRID_SQL = """
b AS (
  SELECT user_id AS series_id, date_trunc('hour', ts) AS bucket,
         avg(value) AS v_avg
  FROM events GROUP BY 1, 2
),
span AS (SELECT series_id, min(bucket) AS b0, max(bucket) AS b1 FROM b GROUP BY 1),
grid AS (
  SELECT series_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM span
),
g AS (
  SELECT grid.series_id, grid.bucket, b.v_avg
  FROM grid LEFT JOIN b ON b.series_id = grid.series_id AND b.bucket = grid.bucket
)
"""


@register(
    "ts_resample_1h",
    """
SELECT user_id AS series_id, date_trunc('hour', ts) AS bucket,
       count(*) AS n_events,
       round(avg(value), 6) AS v_avg,
       round(min(value), 6) AS v_min,
       round(max(value), 6) AS v_max,
       round(arg_min(value, ts), 6) AS v_first,
       round(arg_max(value, ts), 6) AS v_last
FROM events
GROUP BY 1, 2
""",
)
def ts_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly downsample per series: count/avg/min/max plus open/close
    (first/last value by event time — ``min_by``/``max_by``, exact
    because (user_id, ts) is unique in the data). One shuffle on the
    composite (series, bucket) key with map-side partials; at cluster
    scale this is the canonical hypertable rollup and can feed a
    date-partitioned materialization (sources/writers.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("user_id").alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("v_avg"),
            F.round(F.min("value"), 6).alias("v_min"),
            F.round(F.max("value"), 6).alias("v_max"),
            F.round(F.min_by("value", "ts"), 6).alias("v_first"),
            F.round(F.max_by("value", "ts"), 6).alias("v_last"),
        )
    )


@register(
    "ts_gapfill_locf",
    f"""
WITH {_GRID_SQL}
SELECT series_id, bucket,
       round(last_value(v_avg IGNORE NULLS) OVER (
         PARTITION BY series_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_locf,
       (v_avg IS NULL) AS is_gap
FROM g
""",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with last-observation-carried-forward: dense hourly grid
    (sequence+explode from one row per series) left-joined with the
    rollup, missing buckets filled by an IGNORE NULLS running ``last``.
    The window reuses the grid's series_id partitioning — one shuffle
    total after the rollup."""
    return resample.gapfill_locf(_hourly_grid(spark, sf_dir))


@register(
    "ts_interpolate_linear",
    f"""
WITH {_GRID_SQL},
ctx AS (
  SELECT series_id, bucket, v_avg,
         last_value(v_avg IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v_avg IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS pb,
         first_value(v_avg IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN v_avg IS NOT NULL THEN bucket END IGNORE NULLS) OVER wn AS nb
  FROM g
  WINDOW wp AS (PARTITION BY series_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY series_id ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT series_id, bucket,
       floor((CASE WHEN v_avg IS NOT NULL THEN v_avg
                   ELSE pv + (nv - pv) * ((epoch(bucket) - epoch(pb))
                                        / (epoch(nb) - epoch(pb))) END)
             * 1000000 + 0.5) / 1000000 AS v_interp,
       (v_avg IS NULL) AS is_gap
FROM ctx
""",
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps: for each missing bucket, lerp
    between the previous and next OBSERVED bucket (IGNORE NULLS window
    picks in both directions over one series partitioning — Catalyst
    fuses both frames into a single Window stage pair on the same
    shuffle). Grid edges are always observed, so every gap has both
    neighbors."""
    return resample.interpolate_linear(_hourly_grid(spark, sf_dir))


@register(
    "ts_rolling_1h",
    """
SELECT event_id, user_id AS series_id,
       floor(CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
             / (count(value) OVER w) + 0.5) / 1e6 AS v_roll_avg,
       count(*) OVER w AS n_roll
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY cast(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
)
def ts_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour mean/count: a time-RANGE window frame on
    epoch seconds (both engines order on the truncated second, so frame
    membership is identical). One shuffle on series_id; the frame is
    streamed, not materialized — state is O(window span), not O(series).
    The rolling mean is the exact micro-unit form
    (plan_tools.exact_mean6): a sliding frame's denominator walks many
    n, so the float-avg 6-dp boundary is reachable (the
    ts_decompose_dow flake class)."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import exact_mean6

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        F.col("user_id").alias("series_id"),
        exact_mean6(F.col("value"), w).alias("v_roll_avg"),
        F.count("*").over(w).alias("n_roll"),
    )


@register(
    "ts_ewma",
    """
WITH ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS t,
         value
  FROM events
),
acc AS (
  SELECT series_id, t, value,
         sum(value * power(0.8, -t)) OVER w AS sx,
         sum(power(0.8, -t)) OVER w AS sw
  FROM ev
  WINDOW w AS (PARTITION BY series_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT series_id, t, round(value, 6) AS value, round(sx / sw, 6) AS ewma
FROM acc
""",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (pandas ``ewm(alpha=0.2,
    adjust=True)`` semantics) as a pure running-sum identity:
    y_i = sum(x_j*(1-a)^(i-j)) / sum((1-a)^(i-j)) = sx_i / sw_i with
    sx = running sum of x_j*(1-a)^-j — the (1-a)^i factor cancels in
    the ratio, so a recursive aggregate becomes two running sums in one
    Window stage. The un-cancelled terms grow as (1-a)^-t, exact for
    series up to ~3k points at a=0.2; beyond that the production path
    is the same identity applied per fixed-size chunk with the chunk
    boundary re-based (renormalization), or the streaming running-stats
    operator (streaming/ops.py)."""
    ev = load_table(spark, sf_dir, "events")
    # Alias BEFORE any window so both window specs partition on the
    # same attribute (series_id) and order on the same column (ts) —
    # one exchange, one sort, and the two running sums fuse into a
    # single Window operator after the row_number stage.
    base = ev.select(F.col("user_id").alias("series_id"), "ts", "value")
    wr = Window.partitionBy("series_id").orderBy("ts")
    wo = wr.rowsBetween(Window.unboundedPreceding, 0)
    numbered = base.withColumn("t", F.row_number().over(wr) - 1)
    decay = F.pow(F.lit(0.8), -F.col("t"))
    return (
        numbered.select(
            "series_id",
            "t",
            "value",
            F.sum(F.col("value") * decay).over(wo).alias("sx"),
            F.sum(decay).over(wo).alias("sw"),
        )
        .select(
            "series_id",
            "t",
            F.round("value", 6).alias("value"),
            F.round(F.col("sx") / F.col("sw"), 6).alias("ewma"),
        )
    )


@register(
    "ts_anomaly_zscore",
    """
WITH s AS (
  SELECT user_id AS series_id, event_id, value,
         avg(value) OVER w AS mu, stddev(value) OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id)
)
SELECT series_id, event_id, round(value, 6) AS value,
       round((value - mu) / sd, 6) AS z
FROM s
WHERE sd > 0 AND abs((value - mu) / sd) > 3
""",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series statistical outliers: |z| > 3 against the series' own
    mean/stddev, computed as whole-partition window aggregates — one
    shuffle on series_id and no second scan (the T4 outlier op's
    model-free statistical twin). Sample stddev on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sd = F.stddev("value").over(w)
    z = (F.col("value") - mu) / sd
    return (
        ev.select(
            F.col("user_id").alias("series_id"),
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("z"),
            sd.alias("_sd"),
            z.alias("_z"),
        )
        .where((F.col("_sd") > 0) & (F.abs(F.col("_z")) > 3))
        .drop("_sd", "_z")
    )


@register(
    "ts_acf_daily",
    """
WITH b AS (
  SELECT user_id AS series_id, date_trunc('day', ts) AS bucket, avg(value) AS v
  FROM events GROUP BY 1, 2
),
lags AS (SELECT unnest([1, 2, 3, 7]) AS lag_d),
pairs AS (
  SELECT a.series_id, l.lag_d, a.v AS v0, c.v AS v1
  FROM b a
  CROSS JOIN lags l
  JOIN b c ON c.series_id = a.series_id
          AND c.bucket = a.bucket + to_days(l.lag_d)
)
SELECT series_id, lag_d, count(*) AS n_pairs, round(corr(v0, v1), 6) AS acf
FROM pairs GROUP BY 1, 2 HAVING count(*) >= 8
""",
)
def ts_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at daily lags {1,2,3,7} — the ACF
    feature vector that feeds season-aware clustering. Time-lag pairs
    come from a keyed self-join on (series, bucket+lag) over the DAILY
    rollup (hourly is too sparse in this data), so gaps pair correctly
    — a row-offset lag() would silently misalign across gaps. The
    4-row lag dimension broadcasts; both sides of the self-join share
    the rollup's partitioning. Pairs-poor (n<8) cells drop."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.col("user_id").alias("series_id"),
            F.date_trunc("day", F.col("ts")).alias("bucket"),
        )
        .agg(F.avg("value").alias("v"))
    )
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in (1, 2, 3, 7)])).alias("lag_d")
    )
    a = b.alias("a").crossJoin(F.broadcast(lags))
    c = b.select(
        F.col("series_id").alias("c_sid"),
        F.col("bucket").alias("c_bucket"),
        F.col("v").alias("v1"),
    )
    pairs = a.join(
        c,
        (F.col("c_sid") == F.col("a.series_id"))
        & (F.col("c_bucket") == F.expr("timestampadd(DAY, lag_d, bucket)")),
    )
    return (
        pairs.groupBy(F.col("a.series_id").alias("series_id"), "lag_d")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.corr(F.col("a.v"), F.col("v1")), 6).alias("acf"),
        )
        .where(F.col("n_pairs") >= 8)
    )


@register(
    "ts_features",
    """
WITH ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS t, value
  FROM events
),
m AS (
  SELECT series_id, t, value, avg(value) OVER (PARTITION BY series_id) AS mu
  FROM ev
),
feats AS (
  SELECT series_id, count(*) AS n, any_value(mu) AS mean,
         avg((value - mu) * (value - mu)) AS m2,
         avg((value - mu) * (value - mu) * (value - mu)) AS m3,
         avg((value - mu) * (value - mu) * (value - mu) * (value - mu)) AS m4,
         regr_slope(value, t) AS slope
  FROM m
  GROUP BY series_id
)
SELECT series_id, n, round(mean, 6) AS mean, round(sqrt(m2), 6) AS std,
       round(m3 / (m2 ^ 1.5), 6) AS skew,
       round(m4 / (m2 * m2) - 3.0, 6) AS ex_kurtosis,
       round(slope, 6) AS slope
FROM feats
""",
)
def ts_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series statistical feature vector (tsfresh-lite): mean,
    std, skewness, excess kurtosis from EXPLICIT central-moment
    formulas — population moments m_k = avg((x-mu)^k), identical
    algebra on both engines (the builtin skewness/kurtosis aggregates
    differ between Spark and DuckDB in bias correction) — plus the OLS
    trend slope over the time ordinal via ANSI regr_slope. The mean
    comes from a whole-partition window, so the moment aggregate reuses
    the same series partitioning: one exchange end-to-end after the
    ordinal window."""
    from the_framework_for_clustering_time_series_data_spark.sources.tables import events_as_series

    ev = events_as_series(spark, sf_dir)
    mu = F.avg("value").over(Window.partitionBy("series_id"))
    m = ev.select("series_id", "t", "value", mu.alias("mu"))
    d = F.col("value") - F.col("mu")
    feats = m.groupBy("series_id").agg(
        F.count("*").alias("n"),
        F.any_value("mu").alias("mean"),
        F.avg(d * d).alias("m2"),
        F.avg(d * d * d).alias("m3"),
        F.avg(d * d * d * d).alias("m4"),
        F.regr_slope("value", "t").alias("slope"),
    )
    return feats.select(
        "series_id",
        "n",
        F.round("mean", 6).alias("mean"),
        F.round(F.sqrt("m2"), 6).alias("std"),
        F.round(F.col("m3") / F.pow("m2", 1.5), 6).alias("skew"),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0, 6).alias("ex_kurtosis"),
        F.round("slope", 6).alias("slope"),
    )


@register(
    "ts_holt_forecast",
    """
WITH RECURSIVE b AS (
  SELECT user_id AS series_id, date_trunc('day', ts) AS bucket,
         avg(value) AS v_avg
  FROM events GROUP BY 1, 2
),
span AS (SELECT series_id, min(bucket) AS b0, max(bucket) AS b1 FROM b GROUP BY 1),
grid AS (
  SELECT series_id, unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket
  FROM span
),
g AS (
  SELECT grid.series_id, grid.bucket,
         round(last_value(b.v_avg IGNORE NULLS) OVER (
           PARTITION BY grid.series_id ORDER BY grid.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v
  FROM grid LEFT JOIN b ON b.series_id = grid.series_id AND b.bucket = grid.bucket
),
n AS (
  SELECT series_id, v,
         row_number() OVER (PARTITION BY series_id ORDER BY bucket) AS rn
  FROM g
),
-- state after consuming rn points: level/trend exactly as the Python
-- recursion (init level=y1, trend=y2-y1; each step sees only the
-- PREVIOUS iteration's rows — SQL-standard recursive semantics)
holt(series_id, i, level, trend) AS (
  SELECT n1.series_id, 1, n1.v, n2.v - n1.v
  FROM n n1 JOIN n n2 ON n2.series_id = n1.series_id AND n2.rn = 2
  WHERE n1.rn = 1
  UNION ALL
  SELECT h.series_id, h.i + 1,
         0.5 * nx.v + (1.0 - 0.5) * (h.level + h.trend),
         0.3 * ((0.5 * nx.v + (1.0 - 0.5) * (h.level + h.trend)) - h.level)
           + (1.0 - 0.3) * h.trend
  FROM holt h JOIN n nx ON nx.series_id = h.series_id AND nx.rn = h.i + 1
),
fin AS (
  SELECT series_id, level, trend,
         row_number() OVER (PARTITION BY series_id ORDER BY i DESC) AS rk
  FROM holt
)
SELECT f.series_id, CAST(hs.h AS INT) AS h,
       round_even(f.level + hs.h * f.trend, 6) AS yhat,
       round_even(f.level, 6) AS level,
       round_even(f.trend, 6) AS trend
FROM fin f CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS h) hs
WHERE f.rk = 1
""",
)
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day-ahead Holt linear-trend forecast per series, fit on the
    LOCF-gap-filled daily grid (uniform steps, as the recursion
    requires). Chain: daily rollup → dense grid → gap-fill (all
    declarative, one series-keyed exchange) → applyInPandas recursion
    (same partitioning — no extra shuffle). Full value-hash oracle: the
    recursion is mirrored as a recursive CTE whose working table IS the
    (level, trend) state — same IEEE double ops in the same order, with
    (1.0 - α) written as the same runtime subtraction and DuckDB's
    round_even matching Python's banker's round. Closed-form behavior
    additionally pinned in tests/test_symbolic.py."""
    from the_framework_for_clustering_time_series_data_spark.operators import forecast

    ev = load_table(spark, sf_dir, "events")
    daily = resample.bucket_rollup(ev, unit="day")
    grid = resample.gapfill_locf(
        resample.dense_grid(daily, step="INTERVAL 1 DAY")
    )
    return forecast.holt_linear_forecast(grid)


@register(
    "ts_rollup_incremental",
    """
SELECT user_id AS series_id, date_trunc('day', ts)::TIMESTAMP AS bucket,
       count(*) AS n_events,
       round(sum(value), 6) AS v_sum,
       round(min(value), 6) AS v_min,
       round(max(value), 6) AS v_max,
       round(avg(value), 6) AS v_avg
FROM events
GROUP BY 1, 2
""",
)
def ts_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: the daily rollup is
    computed as OLD PARTIALS (events before a cutoff — standing in for
    yesterday's materialization) merged with the NEW DELTA's partials
    (events at/after the cutoff), exploiting that count/sum/min/max are
    algebraic: merge = re-aggregate the two partial tables, avg derives
    at the end. The oracle is the from-scratch rollup — the equality IS
    the correctness statement of incremental view maintenance. At fleet
    scale the old side is read back from the materialized store
    (sources/writers.py date-partitioned layout) and only the delta
    scans raw events; cost becomes O(delta), not O(history)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.col("user_id").alias("series_id"),
            F.date_trunc("day", F.col("ts")).alias("bucket"),
        ).agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    old = partials(ev.where(F.col("ts") < cutoff))
    delta = partials(ev.where(F.col("ts") >= cutoff))
    merged = (
        old.unionByName(delta)
        .groupBy("series_id", "bucket")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "series_id",
        "bucket",
        "n_events",
        F.round("s", 6).alias("v_sum"),
        F.round("mn", 6).alias("v_min"),
        F.round("mx", 6).alias("v_max"),
        F.round(F.col("s") / F.col("n_events"), 6).alias("v_avg"),
    )


# --- LTTB oracle: the sequential per-series selection as a DuckDB
# recursive CTE.  The kernel's float arithmetic is replicated with the
# SAME association order (area = (ax-cx)*(y_j-ay) - (ax-x_j)*(ay-cy),
# bucket means as sequential sum/len, np.linspace edges as
# trunc(1 + i*((n-2)/18)) with the last edge pinned to n-1 exactly like
# endpoint=True), so the integer SELECTION — the only thing the picks
# depend on — is bit-identical.  x is the ns epoch as DOUBLE, matching
# pandas datetime64[ns].astype('int64') in the kernel.  DuckDB can't
# name a subexpression inside a recursive term, so the candidate-area
# lambda appears twice (once under argmax's list_indexof, once under
# max) — generated here from one helper to keep them identical.
def _lttb_mean(coord: str) -> str:
    """Mean of the NEXT bucket's coordinate slice (1-based inclusive
    DuckDB slice == Python [nxt_lo:nxt_hi))."""
    stop = "CASE WHEN r.step + 2 < 19 THEN e.edges[r.step + 3] ELSE e.n END"
    return (
        f"list_aggregate(e.{coord}[e.edges[r.step + 2] + 1 : {stop}], 'sum')"
        f" / ({stop} - e.edges[r.step + 2])"
    )


_LTTB_AREAS = f"""list_transform(
  range(e.edges[r.step + 1], e.edges[r.step + 2]),
  j -> abs((e.xs[r.cur_i + 1] - {_lttb_mean("xs")})
             * (e.ys[j + 1] - e.ys[r.cur_i + 1])
           - (e.xs[r.cur_i + 1] - e.xs[j + 1])
             * (e.ys[r.cur_i + 1] - {_lttb_mean("ys")})))"""


@register(
    "ts_lttb_downsample",
    f"""
WITH RECURSIVE b AS (
  SELECT user_id AS series_id, date_trunc('day', ts)::TIMESTAMP AS bucket,
         avg(value) AS v_avg
  FROM events GROUP BY 1, 2
),
arr AS (
  SELECT series_id,
         list(bucket ORDER BY bucket) AS bs,
         list(CAST(epoch_ns(bucket) AS DOUBLE) ORDER BY bucket) AS xs,
         list(v_avg ORDER BY bucket) AS ys,
         count(*)::INT AS n
  FROM b GROUP BY 1
),
ed AS (
  SELECT series_id, n, xs, ys,
         list_concat(
           list_transform(range(0, 18),
             i -> CAST(trunc(1.0 + i * ((n - 2.0) / 18.0)) AS INT)),
           [n - 1]) AS edges
  FROM arr
),
rec AS (
  SELECT series_id, 0 AS step, 0 AS cur_i FROM ed
  UNION ALL
  SELECT r.series_id, r.step + 1,
         e.edges[r.step + 1]
           + list_indexof({_LTTB_AREAS}, list_aggregate({_LTTB_AREAS}, 'max')) - 1
  FROM rec r JOIN ed e USING (series_id)
  WHERE r.step < 18
),
picks AS (
  SELECT series_id, step AS pick, cur_i AS i FROM rec
  UNION ALL
  SELECT series_id, 19 AS pick, n - 1 AS i FROM ed
)
SELECT p.series_id, a.bs[p.i + 1] AS bucket, round(a.ys[p.i + 1], 6) AS v,
       CAST(p.pick AS INT) AS pick
FROM picks p JOIN arr a USING (series_id)
""",
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB visual downsampling to 20 points per series over the daily
    rollup: the scale-safe rendering path for the reference's raw
    series plots (app.py:1734, 2253). Declarative rollup → one
    series-keyed applyInPandas; selection invariants pinned in
    tests/test_symbolic.py; the full value-hash oracle above replays
    the sequential pick loop as a recursive CTE (valid whenever every
    series has > threshold points, which holds for the daily rollup at
    every test SF — 21+ days per series)."""
    ev = load_table(spark, sf_dir, "events")
    daily = resample.bucket_rollup(ev, unit="day")
    return resample.lttb_downsample(daily, threshold=20)


@register(
    "ts_matrix_profile",
    """
WITH b AS (
  SELECT user_id AS series_id, date_trunc('day', ts)::TIMESTAMP AS bucket, avg(value) AS v_avg
  FROM events GROUP BY 1, 2
),
span AS (SELECT series_id, min(bucket) AS b0, max(bucket) AS b1 FROM b GROUP BY 1),
grid AS (
  SELECT series_id, unnest(generate_series(b0, b1, INTERVAL 1 DAY)) AS bucket FROM span
),
g AS (
  SELECT grid.series_id, grid.bucket,
         round(last_value(b.v_avg IGNORE NULLS) OVER (
           PARTITION BY grid.series_id ORDER BY grid.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v
  FROM grid LEFT JOIN b USING (series_id, bucket)
),
arr AS (SELECT series_id, list(v ORDER BY bucket) AS vs, count(*)::INT AS n FROM g GROUP BY 1),
wi AS (
  SELECT series_id, vs, CAST(unnest(range(0, n - 6)) AS INT) AS i
  FROM arr WHERE n - 6 >= 6
),
st AS (
  SELECT series_id, vs, i,
         list_aggregate(vs[i + 1 : i + 7], 'sum') / 7.0 AS mu
  FROM wi
),
st2 AS (
  SELECT series_id, vs, i, mu,
         sqrt(list_aggregate(list_transform(vs[i + 1 : i + 7],
                x -> (x - mu) * (x - mu)), 'sum') / 7.0) AS sd
  FROM st
),
pr AS (
  SELECT a.series_id, a.i, b.i AS j,
         CASE
           WHEN a.sd < 1e-12 AND b.sd < 1e-12 THEN 0.0
           WHEN (a.sd < 1e-12) != (b.sd < 1e-12) THEN 14.0
           ELSE least(greatest(14.0 * (1.0 -
             ((list_aggregate(list_transform(range(0, 7),
                  k -> a.vs[a.i + k + 1] * b.vs[b.i + k + 1]), 'sum')
               - 7.0 * (a.mu * b.mu))
              / (7.0 * ((CASE WHEN a.sd < 1e-12 THEN 1.0 ELSE a.sd END)
                        * (CASE WHEN b.sd < 1e-12 THEN 1.0 ELSE b.sd END))))),
             0.0), 28.0)
         END AS d2
  FROM st2 a JOIN st2 b
    ON a.series_id = b.series_id AND abs(a.i - b.i) >= 4
),
nn AS (
  SELECT series_id, i AS idx, j AS nn_idx, d2,
         row_number() OVER (PARTITION BY series_id, i
                            ORDER BY floor(d2 * 1e6 + 0.5) / 1e6, j) AS rn
  FROM pr
),
prof AS (
  SELECT series_id, idx, nn_idx, round(sqrt(d2), 6) AS mp FROM nn WHERE rn = 1
),
ranked AS (
  SELECT series_id, idx, nn_idx, mp,
         row_number() OVER (PARTITION BY series_id ORDER BY mp ASC, idx ASC) AS rm,
         row_number() OVER (PARTITION BY series_id ORDER BY mp DESC, idx ASC) AS rd
  FROM prof
)
SELECT series_id,
       CAST(min(CASE WHEN rm = 1 THEN idx END) AS INT) AS motif_idx,
       CAST(min(CASE WHEN rm = 1 THEN nn_idx END) AS INT) AS motif_nn_idx,
       min(CASE WHEN rm = 1 THEN mp END) AS motif_mp,
       CAST(min(CASE WHEN rd = 1 THEN idx END) AS INT) AS discord_idx,
       min(CASE WHEN rd = 1 THEN mp END) AS discord_mp
FROM ranked GROUP BY 1
""",
)
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series matrix-profile summary over the LOCF daily grid
    (window m=7): the top MOTIF (lowest-profile window pair — the most
    repeated weekly shape) and the top DISCORD (highest-profile window
    — the most anomalous week), per series. The exact-neighbor
    counterpart of the SAX-pruned corpus motif search
    (operators/motifs.verified_motifs) and the shape-anomaly sibling of
    ts_anomaly_zscore's pointwise screen.

    Chain: daily rollup → dense grid → LOCF (declarative, one
    series-keyed exchange) → matrix_profile applyInPandas (same
    partitioning, one NumPy matmul per series) → per-series argmin /
    argmax with deterministic (value, idx) tie-breaks — windows over
    the same partitioning again, so still no extra exchange."""
    from pyspark.sql.window import Window

    from the_framework_for_clustering_time_series_data_spark.operators import motifs

    ev = load_table(spark, sf_dir, "events")
    daily = resample.bucket_rollup(ev, unit="day")
    grid = resample.gapfill_locf(
        resample.dense_grid(daily, step="INTERVAL 1 DAY")
    )
    mp = motifs.matrix_profile(grid, m=7)
    wm = Window.partitionBy("series_id").orderBy(F.col("mp").asc(), F.col("idx").asc())
    wd = Window.partitionBy("series_id").orderBy(F.col("mp").desc(), F.col("idx").asc())
    return (
        mp.withColumn("rn_motif", F.row_number().over(wm))
        .withColumn("rn_discord", F.row_number().over(wd))
        .where((F.col("rn_motif") == 1) | (F.col("rn_discord") == 1))
        .groupBy("series_id")
        .agg(
            F.count("*").alias("_k"),
            F.min_by(F.col("idx"), F.col("rn_motif")).alias("motif_idx"),
            F.min_by(F.col("nn_idx"), F.col("rn_motif")).alias("motif_nn_idx"),
            F.min_by(F.col("mp"), F.col("rn_motif")).alias("motif_mp"),
            F.min_by(F.col("idx"), F.col("rn_discord")).alias("discord_idx"),
            F.min_by(F.col("mp"), F.col("rn_discord")).alias("discord_mp"),
        )
        .drop("_k")
    )


@register(
    "ts_drawdown",
    """
WITH b AS (
  SELECT user_id AS series_id,
         floor(epoch(date_trunc('day', ts)) / 86400)::BIGINT AS day,
         CAST(round(avg(value) * 1000000) AS BIGINT) AS v_us
  FROM events GROUP BY 1, 2
),
run AS (
  SELECT series_id, day,
         sum(v_us) OVER (PARTITION BY series_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS equity_us
  FROM b
),
eq AS (
  SELECT series_id, day, equity_us,
         max(equity_us) OVER (PARTITION BY series_id ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak_us
  FROM run
),
dd AS (
  SELECT series_id, day, peak_us - equity_us AS dd_us,
         count(*) OVER (PARTITION BY series_id) AS n_days,
         row_number() OVER (PARTITION BY series_id
                            ORDER BY peak_us - equity_us DESC, day) AS rn
  FROM eq
)
SELECT series_id, n_days, day AS worst_day, CAST(dd_us AS BIGINT) AS max_drawdown_us,
       round(dd_us / 1000000.0, 6) AS max_drawdown
FROM dd WHERE rn = 1
""",
)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series over the cumulative daily value
    (running peak of the running sum minus the running sum; worst day
    reported, earliest on ties) — the classic risk/regression metric
    for any cumulative KPI, absent from the reference's stats panel
    (A1) which is pointwise only.

    Determinism: daily values quantize to exact BIGINT micro-units
    BEFORE the running sums, so every window result is integer
    arithmetic — immune to the float sum-order flake class
    (ts_seasonal_naive_eval's lesson) — and the double rendering at
    the end divides exact integers. Shape: the rollup exchange on
    (series, day) then ONE series exchange carrying the running-sum
    window, the nested running-max window, the per-series count, and
    the argmax ranking — Catalyst stacks all four on the same sort."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        F.col("user_id").alias("series_id"),
        F.floor(F.date_trunc("day", F.col("ts")).cast("long") / 86400)
        .cast("long")
        .alias("day"),
    ).agg(F.round(F.avg("value") * 1e6, 0).cast("long").alias("v_us"))
    wrun = (
        Window.partitionBy("series_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    eq = b.select(
        "series_id",
        "day",
        F.sum("v_us").over(wrun).alias("equity_us"),
    ).withColumn("peak_us", F.max("equity_us").over(wrun))
    wcnt = Window.partitionBy("series_id")
    wrnk = Window.partitionBy("series_id").orderBy(
        (F.col("peak_us") - F.col("equity_us")).desc(), "day"
    )
    dd = eq.select(
        "series_id",
        "day",
        (F.col("peak_us") - F.col("equity_us")).alias("dd_us"),
        F.count("*").over(wcnt).alias("n_days"),
        F.row_number().over(wrnk).alias("rn"),
    )
    return dd.where(F.col("rn") == 1).select(
        "series_id",
        "n_days",
        F.col("day").alias("worst_day"),
        F.col("dd_us").alias("max_drawdown_us"),
        F.round(F.col("dd_us") / 1e6, 6).alias("max_drawdown"),
    )
