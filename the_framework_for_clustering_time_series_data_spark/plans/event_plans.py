"""Event-table plans exercising the time-series join operators
(operators/joins.py) plus the relational surface the reference lacks
outright (SURVEY.md §2.9): rollup/grouping sets, general window
functions, and set operations. All DuckDB-oracle-checked.

Timestamp discipline: events.ts is parquet TIMESTAMP(NANOS); Spark
reads it truncated to µs (sources/tables.py), DuckDB to µs as well —
oracles compare on ``epoch_ns(ts)//1000`` (µs) or floor-epoch seconds,
never on engine-local timestamp rendering.
"""

from __future__ import annotations

import pandas as pd  # module-level: PEP 563 stringifies the pandas-UDF
# type hints and get_type_hints resolves them against MODULE globals,
# so a function-local ``import pandas`` would NameError at inference
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.operators import joins
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


@register(
    "j1_asof_join",
    """
WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
     p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     m AS (
       SELECT c.event_id AS click_id,
              c.user_id,
              epoch_ns(c.ts) // 1000 AS ts_us,
              c.value AS click_value,
              p.value AS asof_value,
              epoch_ns(p.ts) // 1000 AS asof_ts_us,
              row_number() OVER (
                PARTITION BY c.event_id
                ORDER BY p.ts DESC NULLS LAST, p.event_id DESC NULLS LAST
              ) AS rn
       FROM c LEFT JOIN p
         ON p.user_id = c.user_id AND p.ts <= c.ts
     )
SELECT click_id, user_id, ts_us,
       round(click_value, 6) AS click_value,
       coalesce(round(asof_value, 6), -999999999) AS asof_value,
       coalesce(asof_ts_us, -1) AS asof_ts_us
FROM m WHERE rn = 1
""",
)
def j1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click picks up the latest purchase by the same
    user at-or-before it (backward inclusive). Spark plan is the
    union-tag + window-last form — one shuffle on user_id, no join node
    (the oracle's O(|c|·|p|) left join is the semantics, not the plan).
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = joins.asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        payload_cols=["value"],
        seq_col="event_id",
    )
    return out.select(
        "click_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 6).alias("click_value"),
        # no-match sentinels: NULL-free outputs hash/sort deterministically
        F.coalesce(F.round("asof_value", 6), F.lit(-999999999.0)).alias("asof_value"),
        F.coalesce(F.unix_micros("asof_ts"), F.lit(-1)).alias("asof_ts_us"),
    )


@register(
    "j2_range_join",
    """
WITH p AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_s
  FROM events WHERE event_type = 'purchase'
), e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
)
SELECT p.purchase_id, p.user_id, p.start_s,
       count(*) AS n_events,
       count(CASE WHEN e.event_type = 'click' THEN 1 END) AS n_clicks
FROM p JOIN e
  ON e.user_id = p.user_id AND e.es > p.start_s AND e.es <= p.start_s + 3600
GROUP BY 1, 2, 3
""",
)
def j2_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: activity in the hour after each purchase.
    Spark executes it as a bucketized equi-join on (user_id, hour
    bucket) + exact range filter — a plain shuffled hash join Catalyst
    and AQE can reason about, never an O(n·m) theta join.
    """
    ev = load_table(spark, sf_dir, "events")
    intervals = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    )
    matched = joins.range_join(
        ev.select("user_id", "event_type", "ts"),
        intervals,
        key_cols=["user_id"],
        bucket_width=3600,
    )
    return (
        matched.groupBy("purchase_id", "user_id", "start")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        )
        .select(
            "purchase_id",
            "user_id",
            F.unix_timestamp("start").alias("start_s"),
            "n_events",
            "n_clicks",
        )
    )


@register(
    "j3_sessionize",
    """
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), flagged AS (
  SELECT user_id, es,
         CASE WHEN es - lag(es) OVER w IS NULL
                OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
), sess AS (
  SELECT user_id, es,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY es
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - 1 AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(es) AS sess_start,
       max(es) AS sess_end,
       max(es) - min(es) AS duration_s
FROM sess
GROUP BY 1, 2
""",
)
def j3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) → per-session
    stats. lag-flag + running-sum in one shuffle/sort on user_id."""
    ev = load_table(spark, sf_dir, "events")
    return joins.session_stats(
        ev, key_cols=["user_id"], ts_col="ts", gap_seconds=1800, seq_col="event_id"
    )


@register(
    "r1_rollup_daily",
    """
WITH e AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_num,
         event_type, value
  FROM events
)
SELECT coalesce(day_num, -1) AS day_num,
       coalesce(event_type, 'ALL') AS event_type,
       grouping(day_num) * 2 + grouping(event_type) AS gid,
       count(*) AS n,
       round(sum(value), 4) AS value_sum
FROM e
GROUP BY ROLLUP(day_num, event_type)
""",
)
def r1_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: (day, type) →
    (day) → grand total in ONE pass via ROLLUP grouping sets — partial
    aggregation map-side, no re-scan per granularity."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).alias("day_num")
    rolled = ev.select(day, "event_type", "value").rollup("day_num", "event_type").agg(
        (F.grouping("day_num") * 2 + F.grouping("event_type")).alias("gid"),
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )
    return rolled.select(
        F.coalesce("day_num", F.lit(-1)).alias("day_num"),
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        "gid",
        "n",
        "value_sum",
    )


@register(
    "mv_incremental_rollup",
    """
SELECT user_id AS series_id,
       count(DISTINCT date_trunc('day', ts)) AS n_days,
       count(*) AS n_events,
       floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / count(*) / 100.0 * 1e6 + 0.5) / 1e6 AS mean_value,
       CAST(min(floor(value * 100 + 0.5)) AS DOUBLE) / 100.0 AS v_min,
       CAST(max(floor(value * 100 + 0.5)) AS DOUBLE) / 100.0 AS v_max
FROM events WHERE value IS NOT NULL
GROUP BY 1
""",
)
def mv_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance proof: per-series lifetime stats
    computed ONLY from daily partial aggregates — the incremental-MV
    path a 100-TB hypertable uses, where each new day appends one
    (series, day) partial of mergeable state (cent-sum, count, min,
    max) and every query reads partials, never raw history. The DuckDB
    oracle computes the same stats from RAW rows, so the value-hash
    match proves the daily-partial decomposition is lossless — exact
    integer cent sums compose associatively, min/max compose, and the
    partial ROW COUNT is exactly the distinct-day count. Two shuffles
    ((series, day) then series), both map-side combined; at scale the
    first materializes once per day, not per query. Build/fold kernels
    (mv_daily_partials / mv_merge_partials below) are SHARED with the
    live maintainer (streaming/ops.streaming_mv_daily_maintainer)."""
    ev = load_table(spark, sf_dir, "events")
    return mv_merge_partials(mv_daily_partials(ev))


def mv_daily_partials(ev: DataFrame) -> DataFrame:
    """The MV's mergeable daily-partial state: per (series, day) —
    exact cent-sum (decimal(38,0), mirroring DuckDB's sum(BIGINT) →
    HUGEINT promotion; int64 would wrap silently past 2^63−1 cents),
    row count, min/max cents. Partials COMPOSE: re-aggregating a union
    of partials with ``merge_daily_partials`` is lossless, which is
    what lets the live maintainer fold each micro-batch in."""
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.col("user_id").alias("series_id"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(
            F.sum(cents.cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
            F.min(cents).alias("mn"),
            F.max(cents).alias("mx"),
        )
    )


def merge_daily_partials(partials: DataFrame) -> DataFrame:
    """Re-aggregate (possibly duplicated-key) daily partials back to
    one row per (series, day) — the associative merge the maintainer
    applies per micro-batch."""
    return partials.groupBy("series_id", "day").agg(
        F.sum("s").cast("decimal(38,0)").alias("s"),
        F.sum("n").alias("n"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def mv_merge_partials(daily: DataFrame) -> DataFrame:
    """Fold daily partials to the per-series lifetime stats — the
    query-time read of the materialized view (partials in, never raw
    history)."""
    merged = daily.groupBy("series_id").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("n_events"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    return merged.select(
        "series_id",
        "n_days",
        "n_events",
        (
            F.floor(
                F.col("s").cast("double") / F.col("n_events") / 100.0 * 1e6
                + 0.5
            )
            / 1e6
        ).alias("mean_value"),
        (F.col("mn").cast("double") / 100.0).alias("v_min"),
        (F.col("mx").cast("double") / 100.0).alias("v_max"),
    )


@register(
    "w1_rank_lag_lead",
    """
WITH ranked AS (
  SELECT user_id, event_id,
         round(value, 6) AS value,
         rank() OVER w AS rnk,
         coalesce(round(value - lag(value) OVER w, 6), 0) AS delta_prev,
         coalesce(round(lead(value) OVER w - value, 6), 0) AS delta_next
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
)
SELECT user_id, event_id, value, rnk, delta_prev, delta_next
FROM ranked WHERE rnk <= 3
""",
)
def w1_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General window functions (absent from the reference, SURVEY.md
    §2.9): per-user top-3 events by value with rank + lag/lead deltas,
    all evaluated in one window stage (one shuffle on user_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    v = F.col("value")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(v, 6).alias("value"),
            F.rank().over(w).alias("rnk"),
            F.coalesce(F.round(v - F.lag(v).over(w), 6), F.lit(0.0)).alias("delta_prev"),
            F.coalesce(F.round(F.lead(v).over(w) - v, 6), F.lit(0.0)).alias("delta_next"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "s1_set_ops",
    """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
UNION ALL
SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM c UNION SELECT * FROM p)
""",
)
def s1_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT / UNION DISTINCT) over the
    clicker and purchaser user sets — the reference's only set op is a
    Python set() on group keys (app.py:209)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    p = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    rows = [
        ("intersect", c.intersect(p)),
        ("except", c.exceptAll(p).distinct()),
        ("union", c.union(p).distinct()),
    ]
    outs = [
        df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")
        for op, df in rows
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "st_session_windows",
    """
WITH e AS (
  SELECT user_id, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), flagged AS (
  SELECT user_id, es, value,
         CASE WHEN es - lag(es) OVER w IS NULL
                OR es - lag(es) OVER w >= 1800 THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
), sess AS (
  SELECT user_id, es, value,
         sum(is_new) OVER (
           PARTITION BY user_id ORDER BY es
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
)
SELECT user_id,
       min(es) AS sess_start,
       max(es) + 1800 AS sess_end,
       count(*) AS n_events,
       round(sum(value), 6) AS value_sum
FROM sess
GROUP BY user_id, session_id
""",
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time session windows (30 min gap) via ``session_window`` —
    the same code path Structured Streaming runs (streaming.ops.
    streaming_sessionize), here in batch mode so the oracle can check
    it. NB session_window treats gap as half-open (an event exactly
    ``gap`` after the previous one starts a NEW session — hence the
    oracle's ``>= 1800``, vs j3_sessionize's ``> 1800``), and window
    end = last event + gap."""
    from the_framework_for_clustering_time_series_data_spark.streaming.ops import streaming_sessionize

    ev = load_table(spark, sf_dir, "events")
    return streaming_sessionize(ev, gap="30 minutes")


@register(
    "f1_json_props",
    """
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS k_avg,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
""",
)
def f1_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column functions (absent from the reference, SURVEY §2.9):
    extract props.k with get_json_object and aggregate per event_type —
    JSON parsing stays JVM-side (Jackson), pushed into the same
    single-shuffle aggregate as the other stats."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k.cast("double")), 6).alias("k_avg"),
        F.min(k.cast("long")).alias("k_min"),
        F.max(k.cast("long")).alias("k_max"),
    )


@register(
    "a5_percentiles",
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
""",
)
def a5_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per event_type (continuous interpolation —
    Spark ``percentile`` ≡ DuckDB quantile_cont). At 100 TB swap to
    percentile_approx (t-digest sketch, mergeable map-side) — same
    plan shape, documented accuracy tradeoff."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "a6_corr_covar",
    """
SELECT event_type,
       round(corr(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS corr_vk,
       round(covar_pop(value, CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS covar_vk,
       round(stddev_pop(value), 6) AS sd_v
FROM events
GROUP BY event_type
""",
)
def a6_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates (corr / covar_pop) between the value column
    and the JSON props.k field — single-pass co-moment aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.corr(F.col("value"), k), 6).alias("corr_vk"),
        F.round(F.covar_pop(F.col("value"), k), 6).alias("covar_vk"),
        F.round(F.stddev_pop("value"), 6).alias("sd_v"),
    )


@register("a5b_percentile_sketch")  # t-digest sketch → rows-only oracle
def a5b_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of a5_percentiles: percentile_approx (mergeable
    quantile sketch, map-side partials — no global sort, no full
    materialization). Accuracy 1/10000; rows-only check (sketch error
    is engine-specific), absolute error vs exact asserted in tests."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile_approx(value, 0.5, 10000)"), 4).alias("p50"),
        F.round(F.expr("percentile_approx(value, 0.9, 10000)"), 4).alias("p90"),
        F.round(F.expr("percentile_approx(value, 0.99, 10000)"), 4).alias("p99"),
    )


@register("d2_approx_distinct")  # HLL sketch → rows-only oracle
def d2_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of d1_distinct_aggs' count(DISTINCT):
    approx_count_distinct (HyperLogLog++, mergeable map-side — one
    shuffle of fixed-size sketches instead of the exact rewrite's
    two-shuffle expand). rsd 1%; relative error vs exact asserted in
    tests/test_plans.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"),
        F.count("*").alias("n_events"),
    )


@register(
    "st_stream_stream_join",
    """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts,
       round(p.value, 6) AS purchase_value
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR
""",
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (attribution: purchases matched to
    the same user's views in the preceding 6 h), run here in batch
    mode so the oracle can check it — the identical plan runs
    watermarked under Structured Streaming with bounded state
    (streaming.ops.stream_stream_attribution_join; stream/batch parity
    asserted in tests/test_streaming.py)."""
    from the_framework_for_clustering_time_series_data_spark.streaming.ops import stream_stream_attribution_join

    ev = load_table(spark, sf_dir, "events")
    return stream_stream_attribution_join(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        within="6 hours",
    )


@register(
    "w2_distribution_windows",
    """
WITH w AS (
  SELECT event_type, event_id, value,
         ntile(4) OVER win AS quartile,
         round(percent_rank() OVER win, 6) AS pct_rank,
         round(cume_dist() OVER win, 6) AS cum_dist,
         round(first_value(value) OVER win, 6) AS v_min,
         floor(CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER wr AS DOUBLE)
               / (count(value) OVER wr) + 0.5) / 1e6 AS running_avg
  FROM events
  WINDOW win AS (PARTITION BY event_type ORDER BY value, event_id),
         wr AS (PARTITION BY event_type ORDER BY value, event_id
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT * FROM w WHERE pct_rank >= 0.99
""",
)
def w2_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist /
    first_value / running avg) — all five share ONE window ordering, so
    Catalyst evaluates them in a single Window stage over a single
    shuffle on event_type. Keeps the top percentile per type. The
    running mean is the exact micro-unit form (plan_tools.exact_mean6):
    a prefix mean's denominator walks every n, so the float-avg 6-dp
    boundary is reachable (the ts_decompose_dow flake class)."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import exact_mean6

    ev = load_table(spark, sf_dir, "events")
    win = Window.partitionBy("event_type").orderBy("value", "event_id")
    running = win.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col("value")
    return (
        ev.select(
            "event_type",
            "event_id",
            v.alias("value"),
            F.ntile(4).over(win).alias("quartile"),
            F.round(F.percent_rank().over(win), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(win), 6).alias("cum_dist"),
            F.round(F.first(v).over(win), 6).alias("v_min"),
            exact_mean6(v, running).alias("running_avg"),
        )
        .where(F.col("pct_rank") >= 0.99)
    )


@register(
    "r2_cube_daily",
    """
WITH e AS (
  SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS day_num,
         event_type, value
  FROM events
)
SELECT coalesce(day_num, -1) AS day_num,
       coalesce(event_type, 'ALL') AS event_type,
       grouping(day_num) * 2 + grouping(event_type) AS gid,
       count(*) AS n,
       round(sum(value), 4) AS value_sum
FROM e
GROUP BY CUBE(day_num, event_type)
""",
)
def r2_cube_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all four (day, type) marginal combinations
    in ONE pass via Catalyst's Expand (4 output rows per input row,
    then one aggregate; no four-scan union). Complements
    r1_rollup_daily's 3-set hierarchy."""
    ev = load_table(spark, sf_dir, "events")
    day_num = F.floor(F.floor(F.unix_timestamp("ts")) / 86400).cast("long").alias("day_num")
    return (
        ev.select(day_num, "event_type", "value")
        .cube("day_num", "event_type")
        .agg(
            F.grouping("day_num").cast("long").alias("_g1"),
            F.grouping("event_type").cast("long").alias("_g2"),
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.coalesce("day_num", F.lit(-1)).alias("day_num"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            (F.col("_g1") * 2 + F.col("_g2")).alias("gid"),
            "n",
            "value_sum",
        )
    )


@register(
    "k1_salted_hot_key_agg",
    """
SELECT event_type,
       round(sum(value), 4) AS value_sum,
       count(value) AS value_count
FROM events
GROUP BY event_type
""",
)
def k1_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation surfaced in the driver gate: events has
    only 5 distinct event_type keys over every row — the hot-key shape
    where one reducer per key straggles at scale. salted_sum_count
    splits each key across 16 salted partials and merges them; the
    oracle is the plain GROUP BY (sum/count are algebraic, so the
    result is bit-stable up to float re-association — hence round)."""
    from the_framework_for_clustering_time_series_data_spark.operators.skew import salted_sum_count

    ev = load_table(spark, sf_dir, "events")
    out = salted_sum_count(ev, ["event_type"], "value", n_salt=16)
    return out.select(
        "event_type",
        F.round("value_sum", 4).alias("value_sum"),
        F.col("value_count"),
    )


@register(
    "k2_salted_hot_join",
    """
WITH prof AS (
  SELECT user_id, count(*) AS u_cnt FROM events GROUP BY 1
)
SELECT e.event_type,
       count(*) AS n,
       CAST(sum(p.u_cnt) AS BIGINT) AS weight_sum
FROM events e JOIN prof p USING (user_id)
GROUP BY e.event_type
""",
)
def k2_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⨝dim equi-join surfaced in the driver gate (the
    salted_join sibling of k1's salted aggregation): events join their
    per-user profile on user_id — under the skewed decade 25 hot users
    carry ~25% of all fact rows, the one-straggler-task shape. The
    salt spreads each hot key over 8 composite-key tasks; the dim side
    replicates 8× (exploded literal range). Results are identical to
    the plain join (the oracle) — all aggregates exact int64 sums. At
    bench scale AQE broadcasts the replicated dim (harmless); the salt
    is load-bearing precisely when the dim is broadcast-ineligible and
    the join shuffles — the case this operator exists for."""
    from the_framework_for_clustering_time_series_data_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy("user_id").agg(F.count("*").alias("u_cnt"))
    joined = salted_join(
        ev.select("user_id", "event_type"), prof, "user_id", n_salt=8
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("u_cnt").alias("weight_sum"),
    )


@register(
    "a7_value_histogram",
    """
SELECT CAST(floor(value / 25) AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(value), 4) AS lo,
       round(max(value), 4) AS hi
FROM events
GROUP BY CAST(floor(value / 25) AS BIGINT)
""",
)
def a7_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width 25): the single-pass
    distribution scan — bucket = floor(v/w), one groupBy with map-side
    partials, result rows = occupied buckets only."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 25).cast("long")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@register(
    "e5_funnel_stages",
    """
WITH s1 AS (
  SELECT user_id, min(epoch_ns(ts) // 1000) AS t1
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND epoch_ns(e.ts) // 1000 >= s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND epoch_ns(e.ts) // 1000 >= s2.t2
  GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, min(epoch_ns(e.ts) // 1000) AS t4
  FROM events e JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) // 1000 >= s3.t3
  GROUP BY e.user_id
)
SELECT s1.user_id,
       (1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
          + (s4.user_id IS NOT NULL)::INT) AS funnel_stage,
       s1.t1 AS signup_us,
       coalesce(s2.t2, -1) AS view_us,
       coalesce(s3.t3, -1) AS click_us,
       coalesce(s4.t4, -1) AS purchase_us
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
        LEFT JOIN s4 ON s1.user_id = s4.user_id
""",
)
def e5_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup->view->click->purchase per user.

    The oracle expresses the cascade as four dependent aggregate-joins
    (min view ts at-or-after first signup, etc.). The Spark plan does it
    in ONE shuffle: filter to funnel events, collect (ts, type) per
    user, sort, and fold the cascade with a higher-order aggregate —
    events-per-user is bounded (human activity), so the per-group array
    is small regardless of total scale; no repeated self-joins that
    would each re-shuffle 100 TB. Ref parity: the reference has no
    funnel op; this covers sequential-pattern queries its event
    workflows (app.py process/event grouping) imply.
    """
    ev = load_table(spark, sf_dir, "events")
    funnel = ev.where(
        F.col("event_type").isin("signup", "view", "click", "purchase")
    ).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )
    grouped = funnel.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts_us", "event_type"))).alias("evs")
    )
    init = F.struct(
        F.lit(-1).cast("long").alias("t1"),
        F.lit(-1).cast("long").alias("t2"),
        F.lit(-1).cast("long").alias("t3"),
        F.lit(-1).cast("long").alias("t4"),
    )

    def step(acc, x):
        t1 = F.when(
            (acc.t1 == -1) & (x.event_type == "signup"), x.ts_us
        ).otherwise(acc.t1)
        t2 = F.when(
            (acc.t2 == -1) & (x.event_type == "view") & (t1 != -1), x.ts_us
        ).otherwise(acc.t2)
        t3 = F.when(
            (acc.t3 == -1) & (x.event_type == "click") & (t2 != -1), x.ts_us
        ).otherwise(acc.t3)
        t4 = F.when(
            (acc.t4 == -1) & (x.event_type == "purchase") & (t3 != -1), x.ts_us
        ).otherwise(acc.t4)
        return F.struct(
            t1.alias("t1"), t2.alias("t2"), t3.alias("t3"), t4.alias("t4")
        )

    folded = grouped.select(
        "user_id", F.aggregate("evs", init, step).alias("f")
    ).where(F.col("f.t1") != -1)
    stage = (
        F.lit(1)
        + (F.col("f.t2") != -1).cast("int")
        + (F.col("f.t3") != -1).cast("int")
        + (F.col("f.t4") != -1).cast("int")
    )
    return folded.select(
        "user_id",
        stage.alias("funnel_stage"),
        F.col("f.t1").alias("signup_us"),
        F.col("f.t2").alias("view_us"),
        F.col("f.t3").alias("click_us"),
        F.col("f.t4").alias("purchase_us"),
    )


@register(
    "e6_cohort_retention",
    """
WITH w AS (
  SELECT user_id, (epoch_ns(ts) // 1000) // 604800000000 AS wk FROM events
),
f AS (SELECT user_id, min(wk) AS wk0 FROM w GROUP BY user_id),
a AS (
  SELECT DISTINCT w.user_id, f.wk0, w.wk - f.wk0 AS week_offset
  FROM w JOIN f ON w.user_id = f.user_id
)
SELECT wk0 AS cohort_week, week_offset, count(*) AS n_users
FROM a GROUP BY wk0, week_offset
""",
)
def e6_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted per week-offset of later activity.

    One shuffle on user_id computes (first week, active-week set) per
    user simultaneously — the oracle's join of the per-user min back to
    the event stream is fused into a single aggregate, then a cheap
    second aggregate over (cohort, offset) pairs (cardinality ~weeks²,
    tiny at any scale).
    """
    ev = load_table(spark, sf_dir, "events")
    wk = (F.unix_micros("ts") / F.lit(604800000000)).cast("long")
    per_user = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("wk0"), F.collect_set("wk").alias("wks"))
    )
    return (
        per_user.select(
            "wk0", F.explode("wks").alias("wk")
        )
        .groupBy(
            F.col("wk0").alias("cohort_week"),
            (F.col("wk") - F.col("wk0")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "j1b_asof_forward",
    """
WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
     p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     m AS (
       SELECT c.event_id AS click_id,
              c.user_id,
              epoch_ns(c.ts) // 1000 AS ts_us,
              c.value AS click_value,
              p.value AS asof_value,
              epoch_ns(p.ts) // 1000 AS asof_ts_us,
              row_number() OVER (
                PARTITION BY c.event_id
                ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST
              ) AS rn
       FROM c LEFT JOIN p
         ON p.user_id = c.user_id AND p.ts >= c.ts
     )
SELECT click_id, user_id, ts_us,
       round(click_value, 6) AS click_value,
       coalesce(round(asof_value, 6), -999999999) AS asof_value,
       coalesce(asof_ts_us, -1) AS asof_ts_us
FROM m WHERE rn = 1
""",
)
def j1b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click picks up the EARLIEST purchase by
    the same user at-or-after it (the "next event" attribution shape).
    Same union-tag + window-last plan as j1 with the mirrored ordering
    — one shuffle, no join node."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = joins.asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        payload_cols=["value"],
        seq_col="event_id",
        direction="forward",
    )
    return out.select(
        "click_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 6).alias("click_value"),
        F.coalesce(F.round("asof_value", 6), F.lit(-999999999.0)).alias("asof_value"),
        F.coalesce(F.unix_micros("asof_ts"), F.lit(-1)).alias("asof_ts_us"),
    )


@register(
    "j1c_asof_nearest",
    """
WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
     p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     b AS (
       SELECT * FROM (
         SELECT c.event_id AS click_id, p.value AS v, p.ts AS pts,
                row_number() OVER (PARTITION BY c.event_id
                  ORDER BY p.ts DESC NULLS LAST, p.event_id DESC NULLS LAST) AS rn
         FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
       ) WHERE rn = 1
     ),
     f AS (
       SELECT * FROM (
         SELECT c.event_id AS click_id, p.value AS v, p.ts AS pts,
                row_number() OVER (PARTITION BY c.event_id
                  ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST) AS rn
         FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts >= c.ts
       ) WHERE rn = 1
     )
SELECT c.event_id AS click_id, c.user_id,
       epoch_ns(c.ts) // 1000 AS ts_us,
       round(c.value, 6) AS click_value,
       coalesce(round(CASE WHEN f.pts IS NULL
                 OR (b.pts IS NOT NULL
                     AND epoch_ns(c.ts) - epoch_ns(b.pts)
                         <= epoch_ns(f.pts) - epoch_ns(c.ts))
            THEN b.v ELSE f.v END, 6), -999999999) AS asof_value,
       coalesce(epoch_ns(CASE WHEN f.pts IS NULL
                 OR (b.pts IS NOT NULL
                     AND epoch_ns(c.ts) - epoch_ns(b.pts)
                         <= epoch_ns(f.pts) - epoch_ns(c.ts))
            THEN b.pts ELSE f.pts END) // 1000, -1) AS asof_ts_us
FROM c JOIN b ON b.click_id = c.event_id
       JOIN f ON f.click_id = c.event_id
""",
)
def j1c_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each click picks up the purchase closest in
    time on either side (ties to the earlier one — pandas merge_asof
    ``direction='nearest'`` semantics). Both directional picks come
    from two Window sorts over ONE union exchange, then a per-row
    distance choice — still no join node."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = joins.asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        payload_cols=["value"],
        seq_col="event_id",
        direction="nearest",
    )
    return out.select(
        "click_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 6).alias("click_value"),
        F.coalesce(F.round("asof_value", 6), F.lit(-999999999.0)).alias("asof_value"),
        F.coalesce(F.unix_micros("asof_ts"), F.lit(-1)).alias("asof_ts_us"),
    )


@register(
    "r5_grouping_sets",
    """
WITH e AS (
  SELECT event_type,
         dayofweek(date_trunc('day', ts)) + 1 AS dow,
         user_id % 10 AS user_band,
         value
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(dow, -1) AS dow,
       coalesce(user_band, -1) AS user_band,
       grouping(event_type) * 4 + grouping(dow) * 2 + grouping(user_band) AS gid,
       count(*) AS n,
       round(avg(value), 6) AS v_avg
FROM e
GROUP BY GROUPING SETS ((event_type, dow), (event_type, user_band), (dow), ())
""",
)
def r5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit (non-hierarchical, non-exhaustive) GROUPING SETS — the
    general form that ROLLUP/CUBE are sugar for: four hand-picked set
    combinations in ONE pass (Expand ×4 + a single aggregate; the
    naive alternative is four scans UNION ALLed). Spark expresses this
    via the SQL GROUPING SETS clause over a temp view of the same
    lineage the other grouping plans use."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.dayofweek(F.date_trunc("day", F.col("ts"))).alias("dow"),
        (F.col("user_id") % 10).alias("user_band"),
        "value",
    )
    view = f"_r5_events_{abs(hash(sf_dir)) % 10**8}"
    e.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(dow, -1) AS dow,
               coalesce(user_band, -1) AS user_band,
               grouping(event_type) * 4 + grouping(dow) * 2
                 + grouping(user_band) AS gid,
               count(*) AS n,
               round(avg(value), 6) AS v_avg
        FROM {view}
        GROUP BY GROUPING SETS ((event_type, dow), (event_type, user_band),
                                (dow), ())
        """
    )


@register(
    "e7_active_streaks",
    """
WITH d AS (
  SELECT DISTINCT user_id,
         floor(epoch(date_trunc('day', ts)) / 86400)::BIGINT AS day
  FROM events
),
g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
),
s AS (
  SELECT user_id, grp, count(*) AS len, min(day) AS start_day
  FROM g GROUP BY user_id, grp
),
r AS (
  SELECT user_id, len, start_day,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_day) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_streaks,
         CAST(sum(len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days
  FROM s
)
SELECT user_id, n_active_days, n_streaks,
       len AS best_len, start_day AS best_start_day
FROM r WHERE rn = 1
""",
)
def e7_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of consecutive
    active days (ties break to the earliest start), plus streak count
    and total active days. The canonical warehouse pattern the
    reference's implicit-row-order model cannot express at all — it
    needs an explicit time axis and ranking (SURVEY.md §1.5, §2.9).

    Shape: ONE exchange on user_id for the entire query. Day dedup is
    a lag()-based first-occurrence filter under the user_id window —
    NOT a global distinct, whose (user_id, day) hashpartitioning
    cannot satisfy the downstream windows' user_id-only distribution
    and would force a second shuffle (locked in tests/test_plans.py).
    After it, the island-id window (day − row_number), the per-island
    aggregate (ClusteredDistribution(user_id, grp) is satisfied by
    hashpartitioning(user_id)), and the per-user ranking/total windows
    all reuse the same exchange AND the same (user_id, day) sort. The
    island trick turns consecutive-run detection into a plain GROUP
    BY: runs of consecutive days share (day − rank), no self-join, no
    iteration."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        "user_id",
        F.floor(F.date_trunc("day", F.col("ts")).cast("long") / 86400)
        .cast("long")
        .alias("day"),
    )
    wd = Window.partitionBy("user_id").orderBy("day")
    d = (
        raw.withColumn("_prev", F.lag("day").over(wd))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("day")))
        .drop("_prev")
    )
    g = d.withColumn("grp", F.col("day") - F.row_number().over(wd))
    s = g.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.min("day").alias("start_day")
    )
    wu = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy(F.col("len").desc(), "start_day")
    return (
        s.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_streaks", F.count("*").over(wu))
        .withColumn("n_active_days", F.sum("len").over(wu))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "n_active_days",
            "n_streaks",
            F.col("len").alias("best_len"),
            F.col("start_day").alias("best_start_day"),
        )
    )


@register(
    "a8_weighted_median",
    """
WITH t AS (
  SELECT event_type, value AS v,
         coalesce(CAST(json_extract(props, '$.k') AS DOUBLE), 0) AS wt
  FROM events
),
c AS (
  SELECT event_type, v,
         sum(wt) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cw,
         sum(wt) OVER (PARTITION BY event_type) AS tw
  FROM t
)
SELECT event_type, round(min(v), 6) AS wmedian
FROM c WHERE cw >= tw / 2 GROUP BY event_type
""",
)
def a8_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median of ``value`` per event type, weighted by
    the JSON ``props.k`` payload — the smallest v whose cumulative
    weight reaches half the total. Implemented as a GROUPED_AGG pandas
    UDF: the custom-UDAF surface (SURVEY.md §2.9 lists the rebuild's
    UDF/UDAF story) — Arrow ships each group's two columns to one
    vectorized NumPy reduction, the slow-path escape hatch for
    aggregates Spark lacks natively. The oracle states the same
    quantity relationally (running-weight window + threshold pick),
    which doubles as the pure-SQL scale path: at 100 TB the window
    form distributes while a giant grouped-agg UDF group would not —
    the UDAF here demonstrates the surface on bounded groups.

    Ties: duplicate v values all carry their summed weight, and both
    formulations pick the v at which the cumulative crosses half, so
    tie order inside a value run cannot change the answer."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # Type-hint form (Series, Series) -> scalar == GROUPED_AGG; the
    # legacy PandasUDFType enum is deprecated (was this suite's one
    # warning). ``pd`` is the module-level import: PEP 563 stringifies
    # these hints and get_type_hints resolves them against module
    # globals, not function locals.
    @pandas_udf("double")
    def wmedian(v: pd.Series, wt: pd.Series) -> float:
        order = np.argsort(v.to_numpy(), kind="stable")
        vv = v.to_numpy()[order]
        ww = wt.to_numpy()[order]
        cw = np.cumsum(ww)
        i = int(np.searchsorted(cw, cw[-1] / 2.0))
        return float(round(vv[i], 6))

    ev = load_table(spark, sf_dir, "events")
    k = F.coalesce(
        F.get_json_object("props", "$.k").cast("double"), F.lit(0.0)
    )
    return (
        ev.select("event_type", "value", k.alias("wt"))
        .groupBy("event_type")
        .agg(wmedian("value", "wt").alias("wmedian"))
    )


@register(
    "f2_variant_props",
    """
WITH v AS (
  SELECT user_id % 8 AS user_band,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT user_band, count(*) AS n,
       min(k) AS k_min, max(k) AS k_max,
       round(avg(k), 6) AS k_avg
FROM v GROUP BY user_band
""",
)
def f2_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4 VariantType: ``parse_json``
    once into a variant column, then typed ``variant_get`` extraction —
    the open-schema path that replaces per-field get_json_object
    re-parsing (f1_json_props' Jackson-per-expression cost) with a
    single parse into a binary-encoded value Tungsten carries natively.
    At 100 TB the difference is one JSON parse per row instead of one
    per (row × extracted field), and variant shredding keeps pushdown
    alive on parquet for stored variants. Same aggregate twin as f1 so
    the two formulations are directly comparable in the plan/bench."""
    ev = load_table(spark, sf_dir, "events")
    var = ev.select(
        (F.col("user_id") % 8).alias("user_band"),
        F.parse_json(F.col("props")).alias("pv"),
    )
    k = F.variant_get(F.col("pv"), "$.k", "bigint")
    return (
        var.select("user_band", k.alias("k"))
        .groupBy("user_band")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.avg("k"), 6).alias("k_avg"),
        )
    )


# Count-min sketch geometry: d=4 affine-modular hash rows, w=64 buckets.
# Affine (a·key + b) mod p mod w with a large prime p is the classic
# pairwise-independent family — and, unlike xxhash64, both engines
# evaluate it exactly, so the sketch itself is oracle-checkable.
from the_framework_for_clustering_time_series_data_spark.operators.sketch import (  # noqa: E402
    CMS_HASHES as _CMS_HASHES,
    CMS_P as _CMS_P,
    CMS_W as _CMS_W,
)


@register(
    "d3_countmin_heavy_hitters",
    f"""
WITH rows_h AS (
  SELECT h.i AS row_i,
         (user_id * h.a + h.b) % {_CMS_P} % {_CMS_W} AS bucket,
         count(*) AS c
  FROM events
  CROSS JOIN (VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_HASHES))}) AS h(i, a, b)
  GROUP BY 1, 2
),
truth AS (
  SELECT user_id, count(*) AS n_true FROM events GROUP BY user_id
),
est AS (
  SELECT t.user_id, t.n_true, min(r.c) AS n_est
  FROM truth t
  JOIN (VALUES {", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_HASHES))}) AS h(i, a, b) ON true
  JOIN rows_h r
    ON r.row_i = h.i AND r.bucket = (t.user_id * h.a + h.b) % {_CMS_P} % {_CMS_W}
  GROUP BY t.user_id, t.n_true
)
SELECT user_id, n_true, n_est, n_est - n_true AS overcount
FROM est WHERE n_est >= 100
""",
)
def d3_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (Cormode & Muthukrishnan,
    J.Alg'05): d=4 pairwise-independent hash rows × w=64 buckets built
    in ONE aggregate pass over events (the 4-row hash dimension is a
    constant broadcast fan-out, like ts_periodogram's period dim);
    estimates are the min over the 4 bucket counters; candidates with
    estimate ≥ 100 are reported against their true counts. CMS
    guarantees n_est ≥ n_true always and n_est ≤ n_true + εN w.h.p. —
    the overcount column exposes the error the 256-counter summary
    pays vs the exact per-key aggregate.

    Why it matters at 100 TB: the sketch is FIXED-SIZE (d×w counters)
    and mergeable, so the first pass shuffles 256 partial counters per
    map task instead of one row per distinct key — the same
    bounded-state story as d2's HLL and a5b's percentile_approx, here
    for point-frequency queries. The probe side joins the tiny sketch
    back broadcast-style; at fleet scale candidates come from a
    prior coarse filter, not the full key list."""
    from the_framework_for_clustering_time_series_data_spark.operators.sketch import cms_bucket, cms_hash_dim, cms_sketch

    ev = load_table(spark, sf_dir, "events")
    hashes = cms_hash_dim(spark)
    sketch = cms_sketch(ev, "user_id")
    truth = ev.groupBy("user_id").agg(F.count("*").alias("n_true"))
    probe = truth.crossJoin(F.broadcast(hashes)).select(
        "user_id",
        "n_true",
        F.col("i").alias("row_i"),
        cms_bucket(F.col("user_id"), F.col("a"), F.col("b")).alias("bucket"),
    )
    est = (
        probe.join(sketch, ["row_i", "bucket"])
        .groupBy("user_id", "n_true")
        .agg(F.min("c").alias("n_est"))
    )
    return est.where(F.col("n_est") >= 100).select(
        "user_id",
        "n_true",
        "n_est",
        (F.col("n_est") - F.col("n_true")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Deterministic sketch twins (d2b / d4 / d5 / a5c): the md5-60-bit and
# affine-modular hash families make each sketch's STATE integer-exact in
# both engines, so — unlike their production forms d2/a5b whose
# HLL++/t-digest internals are engine-specific — the full sketch, not
# just its error band, is value-hash-verified.
from the_framework_for_clustering_time_series_data_spark.operators.dedup import md5_60bit_hash as _md5_60bit  # noqa: E402
from the_framework_for_clustering_time_series_data_spark.operators.sketch import (  # noqa: E402
    BLOOM_M as _BLOOM_M,
    HLL_ALPHA_NUM_SQL as _HLL_ALPHA_NUM,
    HLL_TWO52 as _HLL_TWO52,
    HLL_TWO53 as _HLL_TWO53,
    KMV_K as _KMV_K,
    hll_estimate_sql as _hll_est,
    hll_registers as _hll_registers,
    hll_sketch_agg as _hll_sketch_agg,
)

_CMS_VALUES = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_CMS_HASHES))


@register(
    "d2b_hll_md5",
    f"""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 15)) AS BIGINT) AS h
  FROM events
),
regs AS (
  SELECT event_type, h % 256 AS bucket,
         max(CASE WHEN h // 256 = 0 THEN {_HLL_TWO52}
                  ELSE (h // 256) & (-(h // 256)) END) AS lsbmax
  FROM h GROUP BY 1, 2
),
sk AS (
  SELECT event_type,
         CAST(sum({_HLL_TWO52} // lsbmax) AS BIGINT)
           + (256 - count(*)) * {_HLL_TWO53} AS s_harmonic,
         CAST(256 - count(*) AS BIGINT) AS v_zero
  FROM regs GROUP BY 1
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_users_exact FROM events GROUP BY 1
),
est AS (
  SELECT s.event_type, s.v_zero, s.s_harmonic, x.n_users_exact,
         CASE WHEN {_HLL_ALPHA_NUM} / CAST(s.s_harmonic AS DOUBLE) <= 640.0e0
                   AND s.v_zero > 0
              THEN 256.0e0 * ln(256.0e0 / s.v_zero)
              ELSE {_HLL_ALPHA_NUM} / CAST(s.s_harmonic AS DOUBLE) END AS e
  FROM sk s JOIN exact x ON x.event_type = s.event_type
)
SELECT event_type, v_zero, s_harmonic, n_users_exact,
       round(e, 6) AS est_hll,
       round((e - n_users_exact) / n_users_exact, 6) AS rel_err
FROM est
""",
)
def d2b_hll_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog twin of d2_approx_distinct (Flajolet
    et al., AofA'07), value-hash-verified END TO END — registers,
    harmonic sum, and estimate — where d2's HLL++ internals are
    engine-private. md5-60-bit hash → bucket = h mod 256, register =
    max ρ(h div 256) with ρ the LSB rank; the harmonic term 2^(53-ρ)
    is the EXACT integer 2^52 / (w & -w) (operators/sketch.py), so the
    whole sketch state is integer arithmetic in both engines. Σ is
    structurally ≤ 256·2^53 = 2^61 — inside int64 at ANY data scale
    (the ceiling is the register count, not the row count), so this
    aggregate is exempt from the decimal(38,0) micro-unit discipline.
    The raw estimate α_m·m²·2^53/Σ is a chain of IEEE-correctly-rounded
    ops on identical literals — bit-identical across engines; the
    small-range branch (E ≤ 2.5m, V > 0) is linear counting m·ln(m/V),
    the one transcendental: parity there is probabilistic under the
    exp/ln cross-engine discipline (c7b-style; exact at all tested SFs
    in practice, V takes ≤ 256 integer values).

    Why it matters at 100 TB: same story as d2 — a fixed 256-register
    mergeable summary per group flows through map-side partial
    aggregation instead of a count(DISTINCT) expand+re-shuffle — but
    auditable: rel_err is pinned against the exact count per group.

    Reference: app.py has no sketch surface; extension per SURVEY §2.9.
    """
    ev = load_table(spark, sf_dir, "events")
    sk = _hll_sketch_agg(_hll_registers(ev, F.col("user_id").cast("string")))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    e = F.expr(_hll_est())
    return (
        sk.join(F.broadcast(exact), "event_type")
        .withColumn("e", e)
        .select(
            "event_type",
            "v_zero",
            "s_harmonic",
            "n_users_exact",
            F.round(F.col("e"), 6).alias("est_hll"),
            F.round(
                (F.col("e") - F.col("n_users_exact")) / F.col("n_users_exact"), 6
            ).alias("rel_err"),
        )
    )


@register(
    "d2c_hll_merge_daily",
    f"""
WITH h AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 15)) AS BIGINT) AS h
  FROM events
),
b AS (SELECT event_type, day, h % 256 AS bucket, h // 256 AS w FROM h),
daily AS (
  SELECT event_type, day, bucket,
         max(CASE WHEN w = 0 THEN {_HLL_TWO52} ELSE w & (-w) END) AS lsbmax
  FROM b GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, bucket, max(lsbmax) AS lsbmax FROM daily GROUP BY 1, 2
),
direct AS (
  SELECT event_type, bucket,
         max(CASE WHEN w = 0 THEN {_HLL_TWO52} ELSE w & (-w) END) AS lsbmax
  FROM b GROUP BY 1, 2
),
cmp AS (
  SELECT coalesce(m.event_type, d.event_type) AS event_type,
         CAST(count(*) AS BIGINT) AS n_registers,
         CAST(sum(CASE WHEN m.lsbmax IS DISTINCT FROM d.lsbmax THEN 1 ELSE 0 END)
              AS BIGINT) AS n_register_mismatch
  FROM merged m FULL JOIN direct d
    ON d.event_type = m.event_type AND d.bucket = m.bucket
  GROUP BY 1
),
days AS (
  SELECT event_type, CAST(count(DISTINCT day) AS BIGINT) AS n_days FROM h GROUP BY 1
),
sk AS (
  SELECT event_type,
         CAST(sum({_HLL_TWO52} // lsbmax) AS BIGINT)
           + (256 - count(*)) * {_HLL_TWO53} AS s_harmonic,
         CAST(256 - count(*) AS BIGINT) AS v_zero
  FROM merged GROUP BY 1
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_users_exact FROM events GROUP BY 1
),
est AS (
  SELECT s.event_type, x.n_users_exact,
         {{EST}} AS e
  FROM sk s JOIN exact x ON x.event_type = s.event_type
)
SELECT c.event_type, dy.n_days, c.n_registers, c.n_register_mismatch,
       round(e.e, 6) AS est_hll, e.n_users_exact,
       round((e.e - e.n_users_exact) / e.n_users_exact, 6) AS rel_err
FROM cmp c
JOIN days dy ON dy.event_type = c.event_type
JOIN est e ON e.event_type = c.event_type
""".replace("{EST}", _hll_est("s.s_harmonic", "s.v_zero")),
)
def d2c_hll_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability proven IN-PLAN: build one register table per
    (event_type, day) — the partial a 100 TB pipeline would persist
    per partition/day — merge the ~30 daily partials by register-wise
    max, and full-outer-join the merged sketch against the
    directly-built one: n_register_mismatch is structurally 0 (max is
    associative + idempotent), and the estimate from the MERGED sketch
    is reported with its error vs the exact count. This is the
    property that makes HLL the standard incremental-rollup
    cardinality statistic — late-arriving days re-merge without
    recomputing history (same contract as ts_rollup_incremental, here
    for count-distinct, which plain rollups cannot do).

    Scale shape: daily partials are one map-side-combined aggregate
    (≤256 rows per group-day); the merge shuffles only register rows
    (≤256·groups·days), never raw keys. All sketch state is exact
    int64 (sketch.py ceiling note); the estimate branch follows d2b's
    discipline.

    Reference: app.py has no sketch surface; extension per SURVEY §2.9.
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    evd = ev.withColumn("day", F.to_date("ts").cast("string"))
    daily = _hll_registers(evd, key, ("event_type", "day"))
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("lsbmax").alias("lsbmax")
    )
    direct = _hll_registers(ev, key)
    j = merged.withColumnRenamed("lsbmax", "lm").join(
        direct.withColumnRenamed("lsbmax", "ld"), ["event_type", "bucket"], "full"
    )
    cmp = j.groupBy("event_type").agg(
        F.count("*").alias("n_registers"),
        F.sum(
            F.when(~F.col("lm").eqNullSafe(F.col("ld")), 1).otherwise(0)
        ).alias("n_register_mismatch"),
    )
    days = evd.groupBy("event_type").agg(F.countDistinct("day").alias("n_days"))
    sk = _hll_sketch_agg(merged)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    est = (
        sk.join(F.broadcast(exact), "event_type")
        .withColumn("e", F.expr(_hll_est()))
    )
    return (
        cmp.join(F.broadcast(days), "event_type")
        .join(F.broadcast(est), "event_type")
        .select(
            "event_type",
            "n_days",
            "n_registers",
            "n_register_mismatch",
            F.round(F.col("e"), 6).alias("est_hll"),
            "n_users_exact",
            F.round(
                (F.col("e") - F.col("n_users_exact")) / F.col("n_users_exact"), 6
            ).alias("rel_err"),
        )
    )


@register(
    "d5b_kmv_setops",
    f"""
WITH el AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(user_id::VARCHAR || '|' ||
                              CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
),
bot AS (
  SELECT event_type, h FROM el
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {_KMV_K}
),
th AS (
  SELECT event_type,
         CASE WHEN count(*) >= {_KMV_K} THEN max(h)
              ELSE 1152921504606846976 END AS theta
  FROM bot GROUP BY 1
),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, least(a.theta, b.theta) AS theta
  FROM th a JOIN th b ON a.event_type < b.event_type
),
samp AS (
  SELECT p.ta, p.tb, p.theta, bo.h,
         max(CASE WHEN bo.event_type = p.ta THEN 1 ELSE 0 END) AS ia,
         max(CASE WHEN bo.event_type = p.tb THEN 1 ELSE 0 END) AS ib
  FROM pairs p JOIN bot bo ON bo.event_type IN (p.ta, p.tb) AND bo.h < p.theta
  GROUP BY 1, 2, 3, 4
),
s AS (
  SELECT ta, tb, theta,
         CAST(count(*) AS BIGINT) AS n_union_s,
         CAST(sum(ia * ib) AS BIGINT) AS n_inter_s
  FROM samp GROUP BY 1, 2, 3
),
tagged AS (
  SELECT p.ta, p.tb, e.h,
         max(CASE WHEN e.event_type = p.ta THEN 1 ELSE 0 END) AS ia,
         max(CASE WHEN e.event_type = p.tb THEN 1 ELSE 0 END) AS ib
  FROM pairs p JOIN el e ON e.event_type IN (p.ta, p.tb)
  GROUP BY 1, 2, 3
),
truth AS (
  SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_union_true,
         CAST(sum(ia * ib) AS BIGINT) AS n_inter_true
  FROM tagged GROUP BY 1, 2
)
SELECT s.ta, s.tb, s.n_union_s, s.n_inter_s,
       round(s.n_union_s * 1152921504606846976.0e0 / CAST(s.theta AS DOUBLE), 6) AS est_union,
       round(s.n_inter_s * 1152921504606846976.0e0 / CAST(s.theta AS DOUBLE), 6) AS est_inter,
       round(CAST(s.n_inter_s AS DOUBLE) / s.n_union_s, 6) AS jac_est,
       t.n_union_true, t.n_inter_true,
       round(CAST(t.n_inter_true AS DOUBLE) / t.n_union_true, 6) AS jac_true,
       round((s.n_union_s * 1152921504606846976.0e0 / CAST(s.theta AS DOUBLE)
              - t.n_union_true) / t.n_union_true, 6) AS err_union
FROM s JOIN truth t ON t.ta = s.ta AND t.tb = s.tb
""",
)
def d5b_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set-operation algebra over KMV/bottom-k summaries
    (Dasgupta et al., the DataSketches theta family): for every pair
    of event types, estimate |A∪B|, |A∩B|, and Jaccard of their
    active (user, day) sets from the two k = 64 bottom-k sketches
    alone — θ = min(θ_A, θ_B), S = {x ∈ S_A ∪ S_B : x < θ},
    n̂_∪ = |S|/θ, n̂_∩ = |S ∩ S_A ∩ S_B|/θ — with the exact
    pair-distinct truth joined alongside as the audit (err_union,
    jac_true). Deterministic md5 hashes make the whole pipeline —
    samples, thetas, estimates — value-hash-verified; when both
    sketches hold fewer than k hashes θ is the 2^60 sentinel and the
    estimates collapse to exact counts (the sf0.001 regime).

    Why it matters at 100 TB: pairwise distinct-set overlap across G
    groups is normally G² distinct-joins over raw keys; from mergeable
    k-row summaries it is a broadcast algebra over G² constant-size
    sketch pairs — the signature theta-sketch use case (audience
    overlap, cross-corpus contamination). Work scales with G², never
    with rows; the truth CTE exists only as the test-SF audit. The
    intersection estimator's variance is amplified by 1/J relative to
    union (documented DataSketches caveat) — k sizes the error band.

    Reference: app.py has no sketch surface; extension per SURVEY §2.9.
    """
    ev = load_table(spark, sf_dir, "events")
    el = ev.select(
        "event_type",
        _md5_60bit(
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.to_date("ts").cast("string"),
            )
        ).alias("h"),
    ).distinct()
    # el feeds both the sketch build and the exact-truth audit; bot
    # feeds both the theta aggregate and the sample join — checkpoint
    # so the distinct scan and the bottom-k window run once (guide §2.4)
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import stage_checkpoint
    el = el.transform(stage_checkpoint, eager=False)
    wb = Window.partitionBy("event_type").orderBy("h")
    bot = (
        el.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
        .transform(stage_checkpoint, eager=False)
    )
    th = bot.groupBy("event_type").agg(
        F.when(F.count("*") >= _KMV_K, F.max("h"))
        .otherwise(F.lit(1152921504606846976))
        .alias("theta")
    )
    ta = th.select(F.col("event_type").alias("ta"), F.col("theta").alias("tha"))
    tb = th.select(F.col("event_type").alias("tb"), F.col("theta").alias("thb"))
    pairs = (
        ta.join(tb, F.col("ta") < F.col("tb"))
        .select("ta", "tb", F.least("tha", "thb").alias("theta"))
    )
    pair_cond = (F.col("event_type") == F.col("ta")) | (
        F.col("event_type") == F.col("tb")
    )
    samp = (
        bot.join(F.broadcast(pairs), pair_cond)
        .where(F.col("h") < F.col("theta"))
        .groupBy("ta", "tb", "theta", "h")
        .agg(
            F.max(F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)).alias("ia"),
            F.max(F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)).alias("ib"),
        )
    )
    s = samp.groupBy("ta", "tb", "theta").agg(
        F.count("*").alias("n_union_s"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("n_inter_s"),
    )
    tagged = (
        el.join(F.broadcast(pairs.select("ta", "tb")), pair_cond)
        .groupBy("ta", "tb", "h")
        .agg(
            F.max(F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)).alias("ia"),
            F.max(F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)).alias("ib"),
        )
    )
    truth = tagged.groupBy("ta", "tb").agg(
        F.count("*").alias("n_union_true"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("n_inter_true"),
    )
    eu = "n_union_s * 1152921504606846976.0e0 / CAST(theta AS DOUBLE)"
    ei = "n_inter_s * 1152921504606846976.0e0 / CAST(theta AS DOUBLE)"
    return (
        s.join(truth, ["ta", "tb"])
        .select(
            "ta",
            "tb",
            "n_union_s",
            "n_inter_s",
            F.round(F.expr(eu), 6).alias("est_union"),
            F.round(F.expr(ei), 6).alias("est_inter"),
            F.round(
                F.col("n_inter_s").cast("double") / F.col("n_union_s"), 6
            ).alias("jac_est"),
            "n_union_true",
            "n_inter_true",
            F.round(
                F.col("n_inter_true").cast("double") / F.col("n_union_true"), 6
            ).alias("jac_true"),
            F.round(
                F.expr(f"({eu} - n_union_true) / n_union_true"), 6
            ).alias("err_union"),
        )
    )


@register(
    "d5_kmv_distinct",
    f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 15)) AS BIGINT) AS h
  FROM events
),
bot AS (
  SELECT event_type, h FROM h
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= {_KMV_K}
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_bottom, max(h) AS kth_hash
  FROM bot GROUP BY 1
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_users_exact FROM events GROUP BY 1
),
est AS (
  SELECT a.event_type, a.n_bottom, a.kth_hash, x.n_users_exact,
         CASE WHEN a.n_bottom < {_KMV_K} THEN CAST(a.n_bottom AS DOUBLE)
              ELSE {_KMV_K - 1}.0e0 * 1152921504606846976.0e0 / CAST(a.kth_hash AS DOUBLE)
         END AS e
  FROM agg a JOIN exact x ON x.event_type = a.event_type
)
SELECT event_type, n_bottom, kth_hash, n_users_exact,
       round(e, 6) AS est_kmv,
       round((e - n_users_exact) / n_users_exact, 6) AS rel_err
FROM est
""",
)
def d5_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al.,
    RANDOM'02), the third mergeable cardinality discipline next to
    d2b's HLL and d2's HLL++: keep the k = 64 smallest DISTINCT
    md5-60-bit hashes per group; n̂ = (k-1)·2^60 / h_(k). Both the
    bottom-k state and the estimate are integer-exact up to ONE
    IEEE-correctly-rounded division ((k-1)·2^60 = 63·2^60 is a 6-bit
    mantissa — an exact double), so the oracle verifies the full
    sketch; below k distinct hashes the sample is the key set and the
    estimate is exactly the count (the sf0.001 regime here).

    Scale shape: the distinct pre-pass shuffles (group, hash) once with
    map-side combine; the bottom-k is a per-group secondary sort on
    that already-shuffled key (external-sort-safe, no driver state).
    Bottom-k sets merge by union+truncate — the property that makes KMV
    the standard distributed distinct sketch when register memory (HLL)
    isn't the binding constraint but mergeable EVIDENCE (the actual
    sample) is wanted.

    Reference: app.py has no sketch surface; extension per SURVEY §2.9.
    """
    ev = load_table(spark, sf_dir, "events")
    hs = ev.select(
        "event_type", _md5_60bit(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    bot = hs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= _KMV_K)
    agg = bot.groupBy("event_type").agg(
        F.count("*").alias("n_bottom"), F.max("h").alias("kth_hash")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    e = F.expr(
        f"CASE WHEN n_bottom < {_KMV_K} THEN CAST(n_bottom AS DOUBLE)"
        f"     ELSE {_KMV_K - 1}.0e0 * 1152921504606846976.0e0 / CAST(kth_hash AS DOUBLE)"
        "      END"
    )
    return (
        agg.join(F.broadcast(exact), "event_type")
        .withColumn("e", e)
        .select(
            "event_type",
            "n_bottom",
            "kth_hash",
            "n_users_exact",
            F.round(F.col("e"), 6).alias("est_kmv"),
            F.round(
                (F.col("e") - F.col("n_users_exact")) / F.col("n_users_exact"), 6
            ).alias("rel_err"),
        )
    )


@register(
    "d4_bloom_md5",
    f"""
WITH build AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-03-01' AND o_orderdate < TIMESTAMP '1995-04-01'
),
bits AS (
  SELECT DISTINCT (k * h.a + h.b) % {_CMS_P} % {_BLOOM_M} AS pos
  FROM build
  CROSS JOIN (VALUES {_CMS_VALUES}) AS h(i, a, b)
),
probe AS (
  SELECT c.c_custkey, c.c_mktsegment,
         (c.c_custkey * h.a + h.b) % {_CMS_P} % {_BLOOM_M} AS pos
  FROM customer c
  CROSS JOIN (VALUES {_CMS_VALUES}) AS h(i, a, b)
),
per_cust AS (
  SELECT p.c_custkey, p.c_mktsegment,
         CASE WHEN count(b.pos) = 4 THEN 1 ELSE 0 END AS maybe
  FROM probe p LEFT JOIN bits b ON b.pos = p.pos
  GROUP BY 1, 2
),
flagged AS (
  SELECT pc.c_custkey, pc.c_mktsegment, pc.maybe,
         CASE WHEN bu.k IS NULL THEN 0 ELSE 1 END AS has_orders
  FROM per_cust pc LEFT JOIN build bu ON bu.k = pc.c_custkey
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(has_orders) AS BIGINT) AS n_with_orders,
       CAST(sum(maybe) AS BIGINT) AS n_bloom_pass,
       CAST(sum(maybe * (1 - has_orders)) AS BIGINT) AS n_false_pos,
       CAST(sum((1 - maybe) * has_orders) AS BIGINT) AS n_missed,
       round(CAST(sum(maybe * (1 - has_orders)) AS DOUBLE)
             / nullif(count(*) - sum(has_orders), 0), 6) AS fpr
FROM flagged GROUP BY 1
""",
)
def d4_bloom_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime join pruning (Bloom, CACM'70), fully
    value-verified: the fact-side predicate (orders placed in
    1995-03) becomes a membership filter on the dim probe — k = 4
    affine-modular hash rows (the d3 CMS family — integer-exact in
    both engines) over m = 2^14 bits built from the month's DISTINCT
    custkeys (≈12% of customers at sf0.1), probed by every customer.
    Per market segment the plan reports the bloom pass-rate against
    the exact semi-join truth — n_missed is structurally 0 (no false
    negatives) and fpr is the measured false-positive rate among true
    negatives (m sized for ≈1.5% at the bench build cardinality so the
    measurement surface is exercised; sizing rule in
    operators/sketch.py:BLOOM_M).

    Why it matters at 100 TB: this is runtime filter pushdown made
    explicit — the probe side joins a kilobytes-scale BROADCAST bit
    table and drops ~87% of its rows before any shuffle, the same
    mechanism as Spark's AQE bloom runtime filters, but with the
    filter's quality (fpr) measured in-plan against truth. The build
    side is a filtered distinct+project with map-side combine; the bit
    table is a constant-size mergeable OR-set.

    Reference: app.py has no join-pruning surface; extension per
    SURVEY §2.9."""
    from the_framework_for_clustering_time_series_data_spark.operators.sketch import bloom_pos, cms_hash_dim

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    hashes = cms_hash_dim(spark)
    build = (
        orders.where(
            (F.col("o_orderdate") >= "1995-03-01")
            & (F.col("o_orderdate") < "1995-04-01")
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = (
        build.crossJoin(F.broadcast(hashes))
        .select(bloom_pos(F.col("k"), F.col("a"), F.col("b")).alias("pos"))
        .distinct()
    )
    probe = (
        cust.select("c_custkey", "c_mktsegment")
        .crossJoin(F.broadcast(hashes))
        .select(
            "c_custkey",
            "c_mktsegment",
            bloom_pos(F.col("c_custkey"), F.col("a"), F.col("b")).alias("pos"),
        )
    )
    per_cust = (
        probe.join(F.broadcast(bits.withColumn("bit", F.lit(1))), "pos", "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.when(F.count("bit") == 4, 1).otherwise(0).alias("maybe"))
    )
    flagged = per_cust.join(
        F.broadcast(build.withColumn("has_orders", F.lit(1))),
        per_cust.c_custkey == F.col("k"),
        "left",
    ).select(
        "c_mktsegment", "maybe", F.coalesce("has_orders", F.lit(0)).alias("has_orders")
    )
    neg = F.count("*") - F.sum("has_orders")
    return flagged.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum("has_orders").cast("long").alias("n_with_orders"),
        F.sum("maybe").cast("long").alias("n_bloom_pass"),
        F.sum(F.col("maybe") * (1 - F.col("has_orders"))).cast("long").alias("n_false_pos"),
        F.sum((1 - F.col("maybe")) * F.col("has_orders")).cast("long").alias("n_missed"),
        F.round(
            F.sum(F.col("maybe") * (1 - F.col("has_orders"))).cast("double")
            / F.nullif(neg, F.lit(0)),
            6,
        ).alias("fpr"),
    )


@register(
    "a5c_quantile_bottomk",
    """
WITH h AS (
  SELECT event_type, event_id, value,
         CAST(('0x' || substr(md5(event_id::VARCHAR), 1, 15)) AS BIGINT) AS h
  FROM events
),
samp AS (
  SELECT event_type, event_id, value FROM h
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) <= 1024
),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rv,
         count(*) OVER (PARTITION BY event_type) AS ns
  FROM samp
)
SELECT event_type,
       CAST(max(ns) AS BIGINT) AS n_sample,
       round(max(CASE WHEN rv = (ns + 1) // 2 THEN value END), 6) AS p50_est,
       round(max(CASE WHEN rv = (9 * ns + 9) // 10 THEN value END), 6) AS p90_est,
       round(max(CASE WHEN rv = (99 * ns + 99) // 100 THEN value END), 6) AS p99_est
FROM ranked GROUP BY 1
""",
)
def a5c_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quantile-sketch twin of a5b_percentile_sketch:
    a bottom-k uniform sample (the 1024 rows with the smallest
    md5-60-bit event_id hash per group — deterministic, MERGEABLE:
    bottom-k of a union is the truncated merge of bottom-ks) followed
    by exact nearest-rank selection ceil(q·n) on the sample, computed
    in pure integer arithmetic ((q_num·n + q_den-1) div q_den — no
    float interpolation anywhere). Where a5b's t-digest internals are
    engine-specific and rows-only-checkable, this sketch's sample AND
    quantiles are value-hash-verified; at SFs where a group holds
    ≤1024 rows the sample is the group and the estimates are the exact
    nearest-rank percentiles.

    Scale shape: the sample pass is one window on the group key
    (external-sort-safe; at fleet scale a per-partition bottom-k
    pre-combine bounds the sort input at k·partitions); the quantile
    pass runs on ≤1024 rows per group. Estimator error is the standard
    bottom-k sampling bound (±O(1/√k) quantile deviation w.h.p.).

    Reference: app.py:214-217 (describe() percentiles); sketch form is
    an extension per SURVEY §2.9."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        "value",
        _md5_60bit(F.col("event_id").cast("string")).alias("h"),
    )
    ws = Window.partitionBy("event_type").orderBy("h", "event_id")
    samp = (
        base.withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") <= 1024)
        .select("event_type", "event_id", "value")
    )
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    ranked = samp.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rv"),
        F.count("*").over(wp).alias("ns"),
    )
    def _at(rank_expr: str):
        return F.max(F.when(F.expr(f"rv = {rank_expr}"), F.col("value")))

    return ranked.groupBy("event_type").agg(
        F.max("ns").alias("n_sample"),
        F.round(_at("(ns + 1) div 2"), 6).alias("p50_est"),
        F.round(_at("(9 * ns + 9) div 10"), 6).alias("p90_est"),
        F.round(_at("(99 * ns + 99) div 100"), 6).alias("p99_est"),
    )


@register(
    "e8_session_paths",
    """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
flagged AS (
  SELECT user_id, event_id, event_type, es,
         CASE WHEN es - lag(es) OVER w IS NULL
                OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, es,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM flagged
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY es, event_id) AS path,
         count(*) AS path_len
  FROM sess GROUP BY user_id, session_id
),
top AS (
  SELECT path, any_value(path_len) AS path_len,
         count(*) AS n_sessions,
         row_number() OVER (ORDER BY count(*) DESC, path) AS rnk
  FROM paths GROUP BY path
)
SELECT rnk, path, path_len, n_sessions FROM top WHERE rnk <= 10
""",
)
def e8_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common session journeys: 30-minute-gap sessions
    (j3's island logic) reduced to their ordered event-type path
    string, counted corpus-wide — the "common paths" report every
    product-analytics suite ships, here as three stacked aggregations.

    Shape: sessionization rides ONE user_id exchange (lag flag +
    running sum + per-session string fold all share the partitioning);
    the path count is a second exchange on the path string with
    map-side partials; the final top-10 is a TakeOrdered over the
    already tiny distinct-path table (ties break lexicographically so
    cross-engine ranking is exact). Path assembly sorts each
    session's struct array JVM-side — no token explode survives the
    session aggregate."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.col("ts").cast("long")).cast("long").alias("es"),
    )
    wo = Window.partitionBy("user_id").orderBy("es", "event_id")
    gap = F.col("es") - F.lag("es").over(wo)
    flagged = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("es", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count("*").alias("path_len"),
    )
    # TakeOrdered the top-10 FIRST, rank the survivors after — the old
    # rank-before-limit form dragged every distinct path through one
    # unpartitioned window partition (the pack_sequences_chunks lesson)
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import tiny_window

    agg = paths.groupBy("path").agg(
        F.any_value("path_len").alias("path_len"),
        F.count("*").alias("n_sessions"),
    )
    top = (
        agg.orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
        .withColumn(
            "rnk",
            F.row_number().over(tiny_window(F.col("n_sessions").desc(), "path", key="path")),
        )
    )
    return top.select("rnk", "path", "path_len", "n_sessions")


@register(
    "e9_event_transitions",
    """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
p AS (
  SELECT event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY es, event_id)
           AS from_type
  FROM e
),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM p WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS prob
FROM c
""",
)
def e9_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types per
    user timeline (the event-stream sibling of text_bigram_fluency's
    token bigrams): count every consecutive (from → to) pair, then
    normalize per source state to transition probabilities.

    Shape: one user_id exchange for the lag, one aggregate onto the
    5×5 state space (map-side partials collapse almost everything
    before the shuffle), and the probability normalization is a
    window over ≤5 rows per source state. The probability divides
    exact integer counts, so cross-engine determinism is free."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(F.col("ts").cast("long")).cast("long").alias("es"),
    )
    wo = Window.partitionBy("user_id").orderBy("es", "event_id")
    p = e.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(wo).alias("from_type"),
    )
    c = (
        p.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(wn), 6).alias("prob"),
    )


@register(
    "r7_recursive_hierarchy",
    """
WITH RECURSIVE u AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
),
anc(user_id, a, depth) AS (
  SELECT user_id, user_id, 0 FROM u
  UNION ALL
  SELECT user_id, a // 2, depth + 1 FROM anc WHERE a > 1
)
SELECT anc.user_id,
       max(anc.depth) AS tree_depth,
       count(*) AS n_chain,
       CAST(sum(coalesce(x.n_events, 0)) AS BIGINT) AS chain_events
FROM anc LEFT JOIN u x ON x.user_id = anc.a
GROUP BY anc.user_id
""",
)
def r7_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup via a RECURSIVE CTE (Spark 4's WITH
    RECURSIVE, UNION ALL form): each user walks its implicit binary
    -tree ancestor chain (id → id/2 → … → 1) and sums the events seen
    along the chain — the org-chart/category-tree aggregation pattern,
    on the only hierarchy the flat test schema implies. The recursion
    is ACYCLIC with chain length ⌈log₂(max id)⌉ ≈ 11, so the
    UNION-ALL-only restriction of Spark's recursive CTEs (no UNION
    dedup yet) costs nothing: every path row is unique by
    construction. Both engines run the recursion natively; exact
    integer outputs make the comparison drift-free.

    At scale: each iteration is one shuffle-free projection + filter
    over the frontier (monotonically shrinking as chains hit the
    root); the single join at the end is frontier × user-dimension.
    The iterative-DataFrame twin of this pattern is
    dedup_connected_groups' min-label loop — use that form when the
    graph has cycles, this form when the planner should see the whole
    unrolled recursion."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    view = f"_r7_users_{abs(hash(sf_dir)) % 10**8}"
    u.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE anc(user_id, a, depth) AS (
          SELECT user_id, user_id, 0 FROM {view}
          UNION ALL
          SELECT user_id, a DIV 2, depth + 1 FROM anc WHERE a > 1
        )
        SELECT anc.user_id,
               max(anc.depth) AS tree_depth,
               count(*) AS n_chain,
               sum(coalesce(x.n_events, 0)) AS chain_events
        FROM anc LEFT JOIN {view} x ON x.user_id = anc.a
        GROUP BY anc.user_id
        """
    )


@register(
    "e10_activity_heatmap",
    """
WITH e AS (
  SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod, value FROM events
),
c AS (
  SELECT dow, hod, count(*) AS n, round(avg(value), 6) AS v_avg
  FROM e GROUP BY dow, hod
),
t AS (SELECT sum(n) AS total FROM c)
SELECT c.dow, c.hod, c.n, c.v_avg,
       round(c.n * 1.0 / t.total, 6) AS share
FROM c CROSS JOIN t
""",
)
def e10_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with per-cell share
    of total — the standard seasonality fingerprint report (the 2-D
    reporting view over the same calendar axes ts_decompose_dow
    models). One aggregate onto a ≤168-cell grid with map-side
    partials; the 1-row total broadcasts back. Session timezone is
    pinned UTC (sources/tables.py) so hour() agrees with the oracle's
    naive-timestamp hour on either testdata layout."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod"), "value"
    )
    c = e.groupBy("dow", "hod").agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("v_avg")
    )
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "dow",
        "hod",
        "n",
        "v_avg",
        F.round(F.col("n") * F.lit(1.0) / F.col("total"), 6).alias("share"),
    )


@register(
    "j4_unconverted_views",
    """
WITH v AS (
  SELECT event_id AS view_id, user_id,
         epoch_ns(ts) // 1000 AS ts_us
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us
  FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT DISTINCT v.view_id
  FROM v JOIN p
    ON p.user_id = v.user_id
   AND p.ts_us > v.ts_us
   AND p.ts_us <= v.ts_us + 21600000000
)
SELECT v.user_id,
       count(*) AS n_views,
       count(CASE WHEN conv.view_id IS NULL THEN 1 END) AS n_unconverted,
       round(count(CASE WHEN conv.view_id IS NOT NULL THEN 1 END) * 1.0
             / count(*), 6) AS conversion_rate
FROM v LEFT JOIN conv ON conv.view_id = v.view_id
GROUP BY v.user_id
""",
)
def j4_unconverted_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal ANTI-join: views with no same-user purchase in the
    following 6 hours, rolled up to per-user conversion stats — the
    negative-space complement of st_stream_stream_join's attribution
    matches (which views DID convert) and e5's ordered funnel.

    Shape: the EXISTS set is computed first with the bucketized
    interval join (operators/joins.range_join — equi on (user, hour
    bucket), so Catalyst never plans a nested-loop theta anti-join),
    then the anti step is a plain LEFT join + null-count against the
    tiny distinct converted-id set. A direct left_anti with the range
    predicate would fall off the equi path — this decomposition keeps
    every join hash-partitioned at any scale."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 6 HOUR")).alias("end"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_type", "ts"
    )
    matched = joins.range_join(
        purchases,
        views.select(F.col("view_id").alias("purchase_id"), "user_id", "start", "end"),
        key_cols=["user_id"],
        bucket_width=3600,
    )
    conv = matched.select(F.col("purchase_id").alias("view_id")).distinct()
    return (
        views.join(
            conv.withColumn("_conv", F.lit(1)), "view_id", "left"
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_views"),
            F.count(F.when(F.col("_conv").isNull(), 1)).alias("n_unconverted"),
            F.round(
                F.count(F.when(F.col("_conv").isNotNull(), 1)) * F.lit(1.0)
                / F.count("*"),
                6,
            ).alias("conversion_rate"),
        )
    )


@register(
    "a9_activity_gini",
    """
WITH c AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n, user_id) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n_users,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM c
)
SELECT event_type, any_value(n_users) AS n_users,
       CAST(any_value(total) AS BIGINT) AS total_events,
       round(2.0 * sum(rnk * n) / (any_value(n_users) * any_value(total))
             - (any_value(n_users) + 1.0) / any_value(n_users), 6) AS gini
FROM r GROUP BY event_type
""",
)
def a9_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity per event type — the
    contribution-inequality audit (0 = perfectly even, →1 = a few
    users dominate) that decides whether a corpus needs
    per-contributor capping before training (the user-level
    counterpart of mix_langs_resample's language rebalancing). Uses
    the exact rank formulation G = 2·Σ rᵢnᵢ/(N·Σnᵢ) − (N+1)/N with a
    (count, user) total order so tied counts rank identically on both
    engines.

    Shape: per-(type, user) aggregate, then rank/total windows over
    the user dimension per type, then a per-type aggregate — exact
    integer sums until the final division."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    wr = Window.partitionBy("event_type").orderBy("n", "user_id")
    wp = Window.partitionBy("event_type")
    r = (
        c.withColumn("rnk", F.row_number().over(wr))
        .withColumn("n_users", F.count("*").over(wp))
        .withColumn("total", F.sum("n").over(wp))
    )
    return r.groupBy("event_type").agg(
        F.any_value("n_users").alias("n_users"),
        F.any_value("total").alias("total_events"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("rnk") * F.col("n"))
            / (F.any_value("n_users") * F.any_value("total"))
            - (F.any_value("n_users") + F.lit(1.0)) / F.any_value("n_users"),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence intervals (single-pass uncertainty)
# --------------------------------------------------------------------------

#: the Poisson(1)-CDF threshold table (see operators/stats.POISSON_T28,
#: the single normative home) — re-exported so the oracle f-string and
#: older imports keep working.
from the_framework_for_clustering_time_series_data_spark.operators.stats import POISSON_T28 as _BOOT_T
_BOOT_REPS = 32


@register(
    "boot_poisson_ci",
    f"""
WITH x AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
         event_id
  FROM events WHERE value IS NOT NULL
),
r AS (
  -- replicate rep reads 28-bit chunk rep%4 of md5(id:rep//4) — the
  -- stats.POISSON_T28 hash-budget layout (4 uniforms per digest)
  SELECT x.event_type, x.v_cents,
         g.rep,
         CAST(('0x' || substr(md5(x.event_id || ':' || (g.rep // 4)),
                              1 + 7 * (g.rep % 4), 7)) AS BIGINT) AS h
  FROM x CROSS JOIN (SELECT unnest(range({_BOOT_REPS})) AS rep) g
),
c AS (
  SELECT event_type, rep,
         sum(CASE WHEN h < {_BOOT_T[0]} THEN 0
                  WHEN h < {_BOOT_T[1]} THEN 1
                  WHEN h < {_BOOT_T[2]} THEN 2
                  WHEN h < {_BOOT_T[3]} THEN 3
                  ELSE 4 END * v_cents) AS s,
         sum(CASE WHEN h < {_BOOT_T[0]} THEN 0
                  WHEN h < {_BOOT_T[1]} THEN 1
                  WHEN h < {_BOOT_T[2]} THEN 2
                  WHEN h < {_BOOT_T[3]} THEN 3
                  ELSE 4 END) AS n
  FROM r GROUP BY 1, 2
),
m AS (
  SELECT event_type, rep,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_r,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(s AS DOUBLE) / CAST(n AS DOUBLE), rep) AS rn
  FROM c
),
f AS (
  SELECT event_type,
         CAST(sum(v_cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS mean_full
  FROM x GROUP BY 1
)
SELECT f.event_type,
       round(f.mean_full, 6) AS mean_full,
       round(max(CASE WHEN m.rn = 2 THEN m.mean_r END), 6) AS boot_lo,
       round(max(CASE WHEN m.rn = {_BOOT_REPS - 1} THEN m.mean_r END), 6) AS boot_hi
FROM f JOIN m USING (event_type)
GROUP BY 1, 2
""",
)
def boot_poisson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence intervals for the per-type value
    mean — the SINGLE-PASS bootstrap (Chamandy et al., Google 2012):
    each row joins every replicate with an independent Poisson(1)
    weight, so 32 resampled means come out of ONE map-side-combined
    aggregate instead of 32 resampling passes — the only bootstrap
    that works at 100 TB. Deterministic twin discipline: the weight is
    md5(event_id:rep)'s top 60 bits compared against exact integer
    Poisson-CDF thresholds (precomputed literals — no transcendental
    in-plan, counts cap at 4), sums in exact cent units, the CI is the
    (2nd, 31st) order statistic of the replicate means ((rep)-pinned
    ties). Row volume is corpus x 32 in the map stage only; the
    shuffle carries type x rep partial sums."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v_cents"),
        "event_id",
    )
    from the_framework_for_clustering_time_series_data_spark.operators.stats import poisson_bootstrap_moments

    c = poisson_bootstrap_moments(
        x, ["event_type"], "v_cents", "event_id", reps=_BOOT_REPS
    )
    mean_r = F.col("s").cast("double") / F.col("n").cast("double") / 100.0
    w = Window.partitionBy("event_type").orderBy(
        (F.col("s").cast("double") / F.col("n").cast("double")), F.col("rep")
    )
    m = c.select("event_type", mean_r.alias("mean_r"), F.row_number().over(w).alias("rn"))
    f = x.groupBy("event_type").agg(
        (F.sum("v_cents").cast("double") / F.count("*").cast("double") / 100.0).alias(
            "mean_full"
        )
    )
    return (
        f.join(m, "event_type")
        .groupBy("event_type", "mean_full")
        .agg(
            F.round(F.max(F.when(F.col("rn") == 2, F.col("mean_r"))), 6).alias("boot_lo"),
            F.round(
                F.max(F.when(F.col("rn") == _BOOT_REPS - 1, F.col("mean_r"))), 6
            ).alias("boot_hi"),
        )
        .select(
            "event_type",
            F.round("mean_full", 6).alias("mean_full"),
            "boot_lo",
            "boot_hi",
        )
    )


# --------------------------------------------------------------------------
# CUPED experiment readout (variance-reduced A/B lift)
# --------------------------------------------------------------------------

#: final-stage float arithmetic, written ONCE and evaluated verbatim by
#: BOTH engines (DuckDB directly; Spark via selectExpr) so the chained
#: double operations have identical expression trees. Inputs are exact
#: integer moment sums (cents / cents^2) cast to double.
_CUPED_FINALS = """
round(CAST(sy_t AS DOUBLE) / n_t / 100.0, 6) AS mean_y_t,
round(CAST(sy_c AS DOUBLE) / n_c / 100.0, 6) AS mean_y_c,
round((CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c) / 100.0, 6) AS lift_raw,
round(((CAST(sy_t AS DOUBLE) / n_t
        - (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
          / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
          * (CAST(sx_t AS DOUBLE) / n_t - CAST(sx AS DOUBLE) / n))
       - (CAST(sy_c AS DOUBLE) / n_c
        - (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
          / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
          * (CAST(sx_c AS DOUBLE) / n_c - CAST(sx AS DOUBLE) / n))) / 100.0, 6) AS lift_cuped,
round((CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
      / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)), 6) AS theta,
round(((CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
       * (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
      / ((CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
       * (CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))), 6) AS var_reduction
"""

_CUPED_MOMENTS = """
u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS arm,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS x,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
mo AS (
  SELECT count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         -- promote BEFORE the product: per-user cents beyond ~3e9
         -- would overflow an int64 square (DuckDB errors, Spark's
         -- non-ANSI multiply wraps silently -- the c12 decimal(38,0)
         -- discipline applies to second moments too)
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_t,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_c,
         sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sx_t,
         sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sx_c,
         sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS sy_t,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sy_c
  FROM u
)
"""


@register(
    "ab_cuped_lift",
    f"""
WITH {_CUPED_MOMENTS}
SELECT n, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
{_CUPED_FINALS}
FROM mo
""",
)
def ab_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED experiment readout (Deng et al., WSDM'13) — the
    variance-reduced A/B lift every large experimentation platform
    computes: users md5-hash-split into arms, pre-period spend (Jan
    1-15) as the covariate for post-period spend (Jan 16+),
    θ = cov(X,Y)/var(X) pooled, adjusted lift via the closed form
    mean(Y_adj) = mean(Y) − θ(mean(X_arm) − mean(X)), variance
    reduction via the CUPED identity var(Y_adj) = var(Y)(1 − ρ²).
    Parity discipline: ALL moments are exact integer cent sums in ONE
    grouped pass + one global aggregate (no float touches a row), and
    the final float arithmetic is ONE shared SQL expression evaluated
    verbatim by both engines (Spark selectExpr == DuckDB text), so the
    chained double operations are identical trees. Per-row work is a
    map-side-combined groupBy on user — the same single-pass shape at
    100 TB."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    cut = F.lit("2024-01-16").cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(F.lit(0))).alias("y"),
    ).select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 2
        ).alias("arm"),
        "x",
        "y",
    )
    mo = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x").cast("decimal(38,0)")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y").cast("decimal(38,0)")).alias("syy"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(F.lit(0))).alias("sx_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(F.lit(0))).alias("sx_c"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(F.lit(0))).alias("sy_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(F.lit(0))).alias("sy_c"),
    )
    return mo.selectExpr("n", "n_t", "n_c", *_CUPED_FINALS.strip().split(",\n"))


@register(
    "ml_kaplan_meier",
    """
WITH u AS (
  SELECT user_id,
         min(epoch_ns(ts)) AS t0,
         min(CASE WHEN event_type = 'error' THEN epoch_ns(ts) END) AS t_err
  FROM events GROUP BY 1
),
dur AS (
  SELECT user_id,
         CAST(floor((coalesce(t_err, (SELECT max(epoch_ns(ts)) FROM events)) - t0)
                    / 3600e9) AS BIGINT) AS t_h,
         (t_err IS NOT NULL) AS observed
  FROM u WHERE coalesce(t_err, (SELECT max(epoch_ns(ts)) FROM events)) >= t0
),
et AS (
  SELECT t_h, count(*) AS d
  FROM dur WHERE observed GROUP BY 1
),
risk AS (
  SELECT e.t_h, e.d,
         (SELECT count(*) FROM dur WHERE dur.t_h >= e.t_h) AS n_risk
  FROM et e
),
fold AS (
  SELECT t_h, d, n_risk,
         list_aggregate(
           list(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
             OVER (ORDER BY t_h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           'product') AS surv
  FROM risk
)
SELECT CAST(t_h AS BIGINT) AS t_h, CAST(d AS BIGINT) AS d_events,
       CAST(n_risk AS BIGINT) AS n_risk, round(surv, 6) AS surv
FROM fold
""",
)
def ml_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator — churn/time-to-failure
    analysis: per user, time from first activity to first 'error'
    event (right-censored at the corpus horizon if none), risk sets
    n_i and event counts d_i at each observed event hour, and the
    survival curve S(t) = prod_{j<=i} (n_j - d_j)/n_j. The cumulative
    product is an ORDERED SEQUENTIAL FOLD of identical double factors
    in both engines (list ORDER BY t + 'product' fold == F.aggregate
    multiply — the g6 discipline applied to products), so the curve is
    bit-deterministic with no exp/ln. Risk sets come from one
    duration table (suffix counts over event hours); everything else
    is grouped aggregates."""
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max(F.unix_micros("ts")).alias("h"))
    u = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "error", F.unix_micros("ts"))
        ).alias("t_err"),
    )
    dur = (
        u.crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.floor(
                (F.coalesce("t_err", "h") - F.col("t0")) / 3.6e9
            )
            .cast("long")
            .alias("t_h"),
            F.col("t_err").isNotNull().alias("observed"),
            (F.coalesce("t_err", "h") >= F.col("t0")).alias("_ok"),
        )
        .where("_ok")
        .drop("_ok")
    )
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import tiny_window

    et = dur.where("observed").groupBy("t_h").agg(F.count("*").alias("d"))
    durs = dur.select(F.col("t_h").alias("td"))
    risk = et.join(
        F.broadcast(durs), F.col("td") >= F.col("t_h"), "left"
    ).groupBy("t_h", "d").agg(F.count("td").alias("n_risk"))
    fold = risk.withColumn(
        "factors",
        F.collect_list(
            F.struct(
                "t_h",
                ((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk").cast("double")).alias("f"),
            )
        ).over(
            tiny_window("t_h", key="t_h").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "surv",
        F.aggregate(
            F.transform(F.sort_array("factors"), lambda s: s.f),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ),
    )
    return fold.select(
        F.col("t_h").cast("long").alias("t_h"),
        F.col("d").cast("long").alias("d_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.round("surv", 6).alias("surv"),
    )


#: log-rank finals — shared expression text (ab_cuped_lift discipline)
_LOGRANK_FINALS = """
round(CAST(sum_d1 AS DOUBLE) - sum_e1, 6) AS o_minus_e,
round((CAST(sum_d1 AS DOUBLE) - sum_e1) * (CAST(sum_d1 AS DOUBLE) - sum_e1)
      / sum_v, 6) AS chi2
"""


@register(
    "ml_logrank_test",
    f"""
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':arm'), 1, 15)) AS BIGINT) % 2 AS arm,
         min(epoch_ns(ts)) AS t0,
         min(CASE WHEN event_type = 'error' THEN epoch_ns(ts) END) AS t_err
  FROM events GROUP BY 1, 2
),
dur AS (
  SELECT arm,
         CAST(floor((coalesce(t_err, (SELECT max(epoch_ns(ts)) FROM events)) - t0)
                    / 3600e9) AS BIGINT) AS t_h,
         (t_err IS NOT NULL) AS observed
  FROM u WHERE coalesce(t_err, (SELECT max(epoch_ns(ts)) FROM events)) >= t0
),
et AS (
  SELECT t_h,
         count(*) AS d,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS d1
  FROM dur WHERE observed GROUP BY 1
),
risk AS (
  SELECT e.t_h, e.d, e.d1,
         (SELECT count(*) FROM dur WHERE dur.t_h >= e.t_h) AS n,
         (SELECT count(*) FROM dur WHERE dur.t_h >= e.t_h AND dur.arm = 1) AS n1
  FROM et e
),
terms AS (
  SELECT CAST(d1 AS DOUBLE) AS td1,
         CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1,
         CASE WHEN n > 1 THEN
           CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (1 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
           ELSE 0.0 END AS v
  FROM risk
),
agg AS (
  SELECT CAST(sum(CAST(td1 AS BIGINT)) AS BIGINT) AS sum_d1,
         list_aggregate(list(e1 ORDER BY e1), 'sum') AS sum_e1,
         list_aggregate(list(v ORDER BY v), 'sum') AS sum_v
  FROM terms
)
SELECT sum_d1, round(sum_e1, 6) AS e1_total,
{_LOGRANK_FINALS}
FROM agg
""",
)
def ml_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between two md5-hashed user arms — the standard
    hypothesis test on survival curves (does arm 1 churn faster?),
    completing the survival family next to ml_kaplan_meier. At each
    event hour: observed arm-1 events d1 vs hypergeometric expectation
    E1 = d·n1/n and variance V; chi2 = (sum(d1-E1))^2 / sum(V), 1 df.
    Parity: risk-set counts are exact integers; the per-time E1/V
    doubles are identical op trees; the two float reductions run as
    value-ORDERED sequential folds in both engines (sum order pinned
    by sorting on the summand — e1/v values, not time — so both
    engines fold the exact same sequence); finals are shared
    expression text."""
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max(F.unix_micros("ts")).alias("h"))
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":arm"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    u = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "error", F.unix_micros("ts"))
        ).alias("t_err"),
    ).select("user_id", arm.alias("arm"), "t0", "t_err")
    dur = (
        u.crossJoin(F.broadcast(horizon))
        .select(
            "arm",
            F.floor((F.coalesce("t_err", "h") - F.col("t0")) / 3.6e9)
            .cast("long")
            .alias("t_h"),
            F.col("t_err").isNotNull().alias("observed"),
            (F.coalesce("t_err", "h") >= F.col("t0")).alias("_ok"),
        )
        .where("_ok")
        .drop("_ok")
    )
    et = dur.where("observed").groupBy("t_h").agg(
        F.count("*").alias("d"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("d1"),
    )
    durs = dur.select(F.col("t_h").alias("td"), F.col("arm").alias("arm_d"))
    risk = (
        et.join(F.broadcast(durs), F.col("td") >= F.col("t_h"), "left")
        .groupBy("t_h", "d", "d1")
        .agg(
            F.count("td").alias("n"),
            F.sum(F.when(F.col("arm_d") == 1, 1).otherwise(0)).alias("n1"),
        )
    )
    terms = risk.selectExpr(
        "CAST(d1 AS DOUBLE) AS td1",
        "CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1",
        """CASE WHEN n > 1 THEN
           CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (1 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
           ELSE 0.0 END AS v""",
    )
    agg = terms.agg(
        F.sum(F.col("td1").cast("long")).alias("sum_d1"),
        F.aggregate(
            F.sort_array(F.collect_list("e1")), F.lit(0.0), lambda a, x: a + x
        ).alias("sum_e1"),
        F.aggregate(
            F.sort_array(F.collect_list("v")), F.lit(0.0), lambda a, x: a + x
        ).alias("sum_v"),
    )
    return agg.selectExpr(
        "sum_d1",
        "round(sum_e1, 6) AS e1_total",
        *_LOGRANK_FINALS.strip().split(",\n"),
    )


@register(
    "ab_ks_test",
    """
WITH x AS (
  SELECT value,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS arm,
         event_id
  FROM events WHERE value IS NOT NULL
),
n AS (
  SELECT sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0
  FROM x
),
st AS (
  SELECT value, arm,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
           OVER (ORDER BY value, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
           OVER (ORDER BY value, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0,
         row_number() OVER (ORDER BY value DESC, event_id DESC) AS rdesc,
         value AS v
  FROM x
),
-- ECDFs may only be compared at distinct-value boundaries: take the
-- LAST pooled row of each value run (the next value's ECDF step)
bnd AS (
  SELECT v, c1, c0,
         row_number() OVER (PARTITION BY v ORDER BY c1 + c0 DESC) AS rn
  FROM st
),
d AS (
  SELECT b.v,
         abs(CAST(b.c1 AS DOUBLE) / n.n1 - CAST(b.c0 AS DOUBLE) / n.n0) AS gap
  FROM bnd b CROSS JOIN n WHERE b.rn = 1
),
best AS (
  SELECT v, gap, row_number() OVER (ORDER BY gap DESC, v) AS rk FROM d
)
SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n0 AS BIGINT) AS n0,
       round(b.gap, 6) AS ks_d, round(b.v, 6) AS at_value
FROM best b CROSS JOIN n WHERE b.rk = 1
""",
)
def ab_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the md5 user
    arms — the DISTRIBUTION-level experiment check next to the mean
    tests (ab_cuped_lift) and survival tests (ml_logrank_test):
    D = max |ECDF_1(x) − ECDF_0(x)|, evaluated at distinct-value
    boundaries (the last pooled row of each value run), with the
    maximizing value reported. Pure order statistics — cumulative
    per-arm counts over one pooled sort, two exact-int divisions per
    boundary, deterministic (gap DESC, value) argmax; no p-value
    because its series expansion is transcendental (consumers compare
    D against the c(α)·sqrt((n1+n0)/(n1·n0)) critical form). The
    pooled cumulative window is the one global sort — at 100 TB this
    runs per stratum or on the with_global_ntiles range-partitioned
    form."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import tiny_window

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        "value",
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 2
        ).alias("arm"),
        "event_id",
    )
    n = x.agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
    )
    wcum = tiny_window("value", "event_id", key="value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    st = x.select(
        F.col("value").alias("v"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).over(wcum).alias("c1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).over(wcum).alias("c0"),
    )
    wlast = Window.partitionBy("v").orderBy((F.col("c1") + F.col("c0")).desc())
    bnd = st.withColumn("rn", F.row_number().over(wlast)).where(F.col("rn") == 1)
    d = bnd.crossJoin(F.broadcast(n)).select(
        "v",
        F.abs(
            F.col("c1").cast("double") / F.col("n1")
            - F.col("c0").cast("double") / F.col("n0")
        ).alias("gap"),
    )
    wbest = tiny_window(F.col("gap").desc(), "v", key="v")
    best = d.withColumn("rk", F.row_number().over(wbest)).where(F.col("rk") == 1)
    return best.crossJoin(F.broadcast(n)).select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n0").cast("long").alias("n0"),
        F.round("gap", 6).alias("ks_d"),
        F.round("v", 6).alias("at_value"),
    )


#: Mann-Whitney finals (shared text): U from half-unit rank sums, the
#: tie-corrected normal approximation z. All inputs exact integers.
_MWU_FINALS = """
CAST((r2_1 - n1 * (n1 + 1)) AS DOUBLE) / 2 AS u1,
round((CAST((r2_1 - n1 * (n1 + 1)) AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 2)
      / sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12.0
             * (CAST(n1 + n0 + 1 AS DOUBLE)
                - CAST(tie3 AS DOUBLE) / (CAST(n1 + n0 AS DOUBLE) * CAST(n1 + n0 - 1 AS DOUBLE)))), 6) AS z
"""


@register(
    "ab_mann_whitney",
    f"""
WITH x AS (
  SELECT value,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS arm
  FROM events WHERE value IS NOT NULL
),
grp AS (
  SELECT value, count(*) AS t,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS t1
  FROM x GROUP BY 1
),
rk AS (
  SELECT value, t, t1,
         sum(t) OVER (ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS below
  FROM grp
),
mo AS (
  SELECT sum(t1 * (2 * coalesce(below, 0) + t + 1)) AS r2_1,
         sum(t1) AS n1,
         sum(t - t1) AS n0,
         sum(t * t * t - t) AS tie3
  FROM rk
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
{_MWU_FINALS}
FROM mo
""",
)
def ab_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the md5 user arms — the rank-based
    location test completing the nonparametric family next to
    ab_ks_test (shape) and ab_cuped_lift (parametric mean): pooled
    midranks with exact tie handling carried in HALF-UNIT integers
    (2*midrank = 2*rank_below + t + 1 per tie group, so no .5 float
    ever exists), U from the rank-sum identity, and the tie-corrected
    normal z as ONE shared expression text. The rank pass is a
    grouped count per distinct value + one running sum over the
    distinct-value table (bounded by the value domain, tiny_window) —
    never a per-row global sort."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import tiny_window

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = ev.select(
        "value",
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 2
        ).alias("arm"),
    )
    grp = x.groupBy("value").agg(
        F.count("*").alias("t"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("t1"),
    )
    wb = tiny_window("value", key="value").rowsBetween(Window.unboundedPreceding, -1)
    rk = grp.withColumn("below", F.sum("t").over(wb))
    mo = rk.agg(
        F.sum(
            F.col("t1") * (2 * F.coalesce("below", F.lit(0)) + F.col("t") + 1)
        ).alias("r2_1"),
        F.sum("t1").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).alias("n0"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    return mo.selectExpr(
        "CAST(n1 AS BIGINT) AS n1",
        "CAST(n0 AS BIGINT) AS n0",
        *_MWU_FINALS.strip().split(",\n"),
    )
