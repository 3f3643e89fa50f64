"""Reference-parity time-series plans (SURVEY.md §2.2-§2.3, §2.7-§2.8)
registered as (Spark, DuckDB-oracle) pairs over the driver test tables.

The ``events`` table plays the reference's uploaded CSV: series_id =
user_id, time ordinal = rank of ts within user, value = value
(TESTDATA/FIXTURES F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.operators import align, prep, stats, trace
from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_ntiles
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import tiny_window
from the_framework_for_clustering_time_series_data_spark.sources.tables import events_as_series, load_table

# Shared oracle CTE: events viewed as (series_id, t, value).
EV = """
ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events
)
"""


@register(
    "flagship_series_summary",
    f"""
WITH {EV}
SELECT series_id,
       count(*) AS n_points,
       round(min(value), 6) AS v_min,
       round(max(value), 6) AS v_max,
       round(avg(value), 6) AS v_mean,
       round(sqrt(avg(value * value)), 6) AS v_rms
FROM ev
GROUP BY series_id
""",
)
def flagship_series_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7 phase 0): per-series length + value stats
    (G2 + A1/A2) in one grouped aggregate — single shuffle on series_id,
    map-side partial aggregation, whole-stage codegen.
    """
    ev = events_as_series(spark, sf_dir)
    v = F.col("value")
    return ev.groupBy("series_id").agg(
        F.count("*").alias("n_points"),
        F.round(F.min(v), 6).alias("v_min"),
        F.round(F.max(v), 6).alias("v_max"),
        F.round(F.avg(v), 6).alias("v_mean"),
        F.round(F.sqrt(F.avg(v * v)), 6).alias("v_rms"),
    )


@register(
    "p5_preprocess_table",
    f"""
WITH {EV}, s AS (
  SELECT min(value) AS vmin, max(value) AS vmax,
         avg(value) AS vavg, stddev_pop(value) AS vstd
  FROM ev
)
SELECT series_id AS process, t, value,
       round((value - vavg) / vstd, 6) AS z_score,
       round((value - vmin) / (vmax - vmin), 6) AS min_max
FROM ev, s
""",
)
def p5_preprocess_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P5 — the reference's Preprocess export: per-row global z-score
    (stddev_pop) + global min-max (app.py:187-236, 358-382).
    """
    out = prep.preprocess_table(events_as_series(spark, sf_dir))
    return out.select(
        "process",
        "t",
        "value",
        F.round("z_score", 6).alias("z_score"),
        F.round("min_max", 6).alias("min_max"),
    )


@register(
    "a1_value_stats",
    """
SELECT round(min(value), 6) AS v_min,
       round(max(value), 6) AS v_max,
       round(avg(value), 6) AS v_mean,
       round(var_pop(value), 6) AS v_var,
       round(sqrt(avg(value * value)), 6) AS v_rms
FROM events
""",
)
def a1_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — global stats panel incl. population variance and RMS
    (app.py:1706-1710, 1037-1048).
    """
    return stats.value_stats(load_table(spark, sf_dir, "events"))


@register(
    "g2_length_stats",
    f"""
WITH {EV}, l AS (SELECT series_id, count(*) AS length FROM ev GROUP BY series_id)
SELECT min(length) AS len_min, max(length) AS len_max,
       round(avg(length), 6) AS len_mean, count(*) AS n_series
FROM l
""",
)
def g2_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — min/max/mean of per-series lengths (app.py:221-232)."""
    return stats.length_stats(events_as_series(spark, sf_dir))


@register(
    "g3_truncation",
    f"""
WITH {EV}, m AS (
  SELECT min(cnt) AS min_len FROM (SELECT count(*) AS cnt FROM ev GROUP BY series_id)
)
SELECT series_id, t, value FROM ev, m WHERE t < min_len
""",
)
def g3_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — truncate every series to the global min length
    (app.py:246-261), long form.
    """
    return align.truncate_to_min(events_as_series(spark, sf_dir))


@register(
    "g4_padding",
    f"""
WITH {EV},
l AS (SELECT series_id, count(*) AS length FROM ev GROUP BY series_id),
m AS (SELECT max(length) AS max_len FROM l)
SELECT series_id, t, value FROM ev
UNION ALL
SELECT l.series_id, unnest(range(l.length, m.max_len)) AS t, 0.0 AS value
FROM l, m WHERE l.length < m.max_len
""",
)
def g4_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 — zero-pad every series to the global max length
    (app.py:266-280); filler rows generated from the per-series length
    table, not by scanning fact rows.
    """
    return align.pad_to_max(events_as_series(spark, sf_dir))


@register(
    "g5_sliding_window",
    f"""
WITH {EV},
l AS (SELECT series_id, count(*) AS length FROM ev GROUP BY series_id),
w AS (
  SELECT series_id, unnest(range(0, ((length - 16) // 4) + 1)) AS window_id
  FROM l WHERE length >= 16
)
SELECT w.series_id, w.window_id, e.t - w.window_id * 4 AS pos, e.value
FROM w JOIN ev e
  ON e.series_id = w.series_id
 AND e.t >= w.window_id * 4 AND e.t < w.window_id * 4 + 16
""",
)
def g5_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 — sliding windows (w=16, s=4, drop_remainder) per series
    (app.py:285-295). Spark plan: per-row window-id explode (fan-out
    ≤ w/s) — no range join, no single-task window.
    """
    return align.sliding_windows(events_as_series(spark, sf_dir), 16, 4).select(
        "series_id", "window_id", "pos", "value"
    )


# --- T* operators over the embeddings table -------------------------------
# embeddings(vec_id, embedding float[64], label) plays the clustered
# 2-D embedding: x/y = first two dims, prediction = label with class 9
# remapped to the DBSCAN outlier marker -1 (FIXTURES.md F3/F4).

EMB2D = """
emb AS (
  SELECT vec_id AS series_id,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y,
         CASE WHEN label = 9 THEN -1 ELSE label END AS prediction
  FROM embeddings
)
"""


def _emb2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        F.col("vec_id").alias("series_id"),
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
        F.when(F.col("label") == 9, F.lit(-1)).otherwise(F.col("label")).alias("prediction"),
    )


@register(
    "t1_centroids",
    f"""
WITH {EMB2D}
SELECT prediction,
       round(avg(x), 6) AS cx, round(avg(y), 6) AS cy,
       count(*) AS n_members
FROM emb WHERE prediction != -1
GROUP BY prediction
""",
)
def t1_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — per-cluster centroid = per-class mean, excluding outliers
    (app.py:1003-1016).
    """
    e = _emb2d(spark, sf_dir)
    out = trace.centroids(
        e.select("series_id", "x", "y"), e.select("series_id", "prediction")
    )
    return out.select(
        "prediction",
        F.round("cx", 6).alias("cx"),
        F.round("cy", 6).alias("cy"),
        "n_members",
    )


@register(
    "t2_representatives",
    f"""
WITH {EMB2D},
c AS (
  SELECT prediction, avg(x) AS cx, avg(y) AS cy
  FROM emb WHERE prediction != -1 GROUP BY prediction
),
d AS (
  SELECT e.prediction, e.series_id, e.x, e.y,
         sqrt((e.x - c.cx)^2 + (e.y - c.cy)^2) AS dist,
         row_number() OVER (
           PARTITION BY e.prediction
           ORDER BY sqrt((e.x - c.cx)^2 + (e.y - c.cy)^2), e.series_id
         ) AS rn
  FROM emb e JOIN c ON e.prediction = c.prediction
  WHERE e.prediction != -1
)
SELECT prediction, series_id, round(x, 6) AS x, round(y, 6) AS y,
       round(dist, 6) AS dist
FROM d WHERE rn = 1
""",
)
def t2_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — per-cluster member nearest its centroid: broadcast join +
    windowed top-1 (replaces app.py:1018-1033's O(k·n) scan).
    """
    e = _emb2d(spark, sf_dir)
    out = trace.representatives(
        e.select("series_id", "x", "y"), e.select("series_id", "prediction")
    )
    return out.select(
        "prediction",
        "series_id",
        F.round("x", 6).alias("x"),
        F.round("y", 6).alias("y"),
        F.round("dist", 6).alias("dist"),
    )


@register(
    "t4_outliers",
    f"""
WITH {EMB2D}
SELECT series_id, round(x, 6) AS x, round(y, 6) AS y
FROM emb WHERE prediction = -1
""",
)
def t4_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 — outlier extraction (prediction == -1) + traceback join to
    the raw coordinate rows (app.py:2308-2342).
    """
    e = _emb2d(spark, sf_dir)
    out = trace.outliers(
        e.select("series_id", "prediction"),
        e.select("series_id", "x", "y"),
    )
    return out.select(
        "series_id", F.round("x", 6).alias("x"), F.round("y", 6).alias("y")
    )


@register(
    "c4_top5_clusters",
    f"""
WITH {EMB2D},
s AS (
  SELECT prediction, count(*) AS n_members, round(avg(x), 6) AS score
  FROM emb WHERE prediction != -1 GROUP BY prediction
),
r AS (
  SELECT *, row_number() OVER (ORDER BY n_members DESC, prediction) AS rn FROM s
)
SELECT prediction, n_members, score FROM r WHERE rn <= 5
""",
)
def c4_top5_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's top-k selection arithmetic (app.py:790-808): rank clusters
    by a score, keep top-5, deterministic tie-break.
    """
    e = _emb2d(spark, sf_dir)
    s = (
        e.where(F.col("prediction") != -1)
        .groupBy("prediction")
        .agg(F.count("*").alias("n_members"), F.round(F.avg("x"), 6).alias("score"))
    )
    w = tiny_window(F.desc("n_members"), "prediction", key="prediction")
    return (
        s.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("prediction", "n_members", "score")
    )


@register(
    "ts_burst_periods",
    """
WITH d AS (
  SELECT user_id AS series_id,
         floor(epoch(date_trunc('day', ts)) / 86400)::BIGINT AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT series_id, day, n,
         avg(n) OVER (PARTITION BY series_id) AS mean_rate
  FROM d
),
b AS (
  SELECT series_id, day, n, mean_rate FROM m
  WHERE n >= 2 * mean_rate AND n >= 3
),
g AS (
  SELECT series_id, day, n, mean_rate,
         day - row_number() OVER (PARTITION BY series_id ORDER BY day) AS grp
  FROM b
)
SELECT series_id, min(day) AS burst_start, max(day) AS burst_end,
       count(*) AS n_days, CAST(sum(n) AS BIGINT) AS n_events,
       round(any_value(mean_rate), 6) AS mean_rate
FROM g GROUP BY series_id, grp
""",
)
def ts_burst_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst periods per series (Kleinberg's two-state burst model
    collapsed to its thresholded form): days at ≥2× the series' mean
    daily rate (and ≥3 events absolute) grouped into maximal
    consecutive runs — start/end/duration/event-mass per burst. The
    event-rate sibling of e7's activity streaks: same gaps-and-islands
    reduction, but over a rate threshold rather than mere presence.

    Shape: daily-count aggregate, whole-partition mean window,
    threshold filter, island window, and the burst aggregate all key
    on series_id — ClusteredDistribution(series_id, grp) accepts the
    series hashpartitioning, so ONE exchange end-to-end (the e7
    lesson applied from the start)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    # pre-partition on the series key: hashpartitioning(series_id)
    # satisfies the (series, day) aggregate's ClusteredDistribution, so
    # the count, the mean window, the island window, and the burst
    # aggregate all ride ONE exchange (the e7 lesson — a plain groupBy
    # here would shuffle on (series, day) and the window would shuffle
    # AGAIN on series alone)
    d = (
        ev.select(
            F.col("user_id").alias("series_id"),
            F.floor(F.date_trunc("day", F.col("ts")).cast("long") / 86400)
            .cast("long")
            .alias("day"),
        )
        .repartition("series_id")
        .groupBy("series_id", "day")
        .agg(F.count("*").alias("n"))
    )
    wm = Window.partitionBy("series_id")
    m = d.withColumn("mean_rate", F.avg("n").over(wm))
    b = m.where((F.col("n") >= 2 * F.col("mean_rate")) & (F.col("n") >= 3))
    wi = Window.partitionBy("series_id").orderBy("day")
    g = b.withColumn("grp", F.col("day") - F.row_number().over(wi))
    return g.groupBy("series_id", "grp").agg(
        F.min("day").alias("burst_start"),
        F.max("day").alias("burst_end"),
        F.count("*").alias("n_days"),
        F.sum("n").alias("n_events"),
        F.round(F.any_value("mean_rate"), 6).alias("mean_rate"),
    ).drop("grp")


@register(
    "ts_interarrival_stats",
    """
WITH e AS (
  SELECT user_id AS series_id, event_id,
         epoch_ns(ts) // 1000 AS ts_us
  FROM events
),
g AS (
  SELECT series_id,
         ts_us - lag(ts_us) OVER (PARTITION BY series_id
                                  ORDER BY ts_us, event_id) AS gap_us
  FROM e
)
SELECT series_id, count(*) AS n_gaps,
       CAST(round(avg(gap_us)) AS BIGINT) AS mean_gap_us,
       min(gap_us) AS min_gap_us,
       max(gap_us) AS max_gap_us,
       round(stddev_pop(gap_us) / avg(gap_us), 6) AS cv
FROM g WHERE gap_us IS NOT NULL
GROUP BY series_id
""",
)
def ts_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival process characterization per series: mean/min/max
    gap and the coefficient of variation (CV ≈ 1 ⇒ Poisson-like
    memoryless arrivals, CV ≫ 1 ⇒ bursty — the statistical complement
    of ts_burst_periods' explicit burst runs, and the quantity that
    sizes session-gap and watermark thresholds from data rather than
    folklore). Gaps in exact integer microseconds; only the CV
    divides, after the aggregate.

    Shape: one series exchange shared by the lag window and the
    per-series aggregate."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("user_id").alias("series_id"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("series_id").orderBy("ts_us", "event_id")
    g = e.select(
        "series_id", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return g.groupBy("series_id").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_us"), 0).cast("long").alias("mean_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.round(F.stddev_pop("gap_us") / F.avg("gap_us"), 6).alias("cv"),
    )


@register(
    "t5_representative_plotdata",
    """
WITH b AS (
  SELECT user_id AS series_id, date_trunc('day', ts) AS day, avg(value) AS v
  FROM events GROUP BY 1, 2
),
f AS (
  SELECT series_id, avg(v) AS mu, stddev_pop(v) AS sigma, count(*) AS n_days
  FROM b GROUP BY series_id
),
p AS (
  SELECT series_id, mu, sigma, n_days,
         ntile(4) OVER (ORDER BY mu, series_id) - 1 AS prediction
  FROM f
),
c AS (
  SELECT prediction, avg(mu) AS cmu, avg(sigma) AS csigma
  FROM p GROUP BY prediction
),
rep AS (
  SELECT p.prediction, p.series_id, p.n_days,
         row_number() OVER (
           PARTITION BY p.prediction
           ORDER BY sqrt((p.mu - c.cmu)^2 + (p.sigma - c.csigma)^2), p.series_id
         ) AS rn
  FROM p JOIN c ON c.prediction = p.prediction
),
pts AS (
  SELECT r.prediction, b.series_id, b.day, b.v, r.n_days,
         row_number() OVER (PARTITION BY b.series_id ORDER BY b.day) AS t_rank
  FROM rep r JOIN b ON b.series_id = r.series_id
  WHERE r.rn = 1
)
SELECT prediction, series_id,
       CAST(t_rank AS BIGINT) AS t_rank, day::TIMESTAMP AS day,
       round(v, 6) AS v
FROM pts
WHERE (t_rank - 1) % CAST(ceil(n_days / 100.0) AS BIGINT) = 0
""",
)
def t5_representative_plotdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — representative PLOTS, the data side completed end to end:
    the exact point payload each cluster's representative-series plot
    renders (app.py:1018-1033 selection + the raw-series figure the
    Dash tab draws around it). Deterministic feature embedding (per-
    series mean/spread of the daily rollup), ntile(4) clusters,
    closest-to-centroid representative per cluster (T2's selection
    rule), then the representative's daily series STRIDE-CAPPED to
    ≤100 points — a dashboard over 100 TB renders O(100) points per
    cluster, never O(n). The LTTB variant of the cap (visually optimal
    but sequential) is pipeline.representative_series(); this stride
    form is SQL-expressible, so the whole T5 chain is value-checked
    against the oracle."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        F.col("user_id").alias("series_id"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.avg("value").alias("v"))
    f = b.groupBy("series_id").agg(
        F.avg("v").alias("mu"),
        F.stddev_pop("v").alias("sigma"),
        F.count("*").alias("n_days"),
    )
    p = with_global_ntiles(
        f, 4, [("_tile", ["mu", "series_id"], None)]
    ).select(
        "series_id", "mu", "sigma", "n_days",
        (F.col("_tile") - 1).alias("prediction"),
    )
    c = p.groupBy("prediction").agg(
        F.avg("mu").alias("cmu"), F.avg("sigma").alias("csigma")
    )
    dist = F.sqrt((F.col("mu") - F.col("cmu")) ** 2 + (F.col("sigma") - F.col("csigma")) ** 2)
    wr = Window.partitionBy("prediction").orderBy(dist, "series_id")
    rep = (
        p.join(F.broadcast(c), "prediction")
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("prediction", "series_id", "n_days")
    )
    wt = Window.partitionBy("series_id").orderBy("day")
    pts = (
        b.join(F.broadcast(rep), "series_id")
        .withColumn("t_rank", F.row_number().over(wt))
    )
    stride = F.ceil(F.col("n_days") / 100.0).cast("long")
    return (
        pts.where((F.col("t_rank") - 1) % stride == 0)
        .select(
            "prediction",
            "series_id",
            F.col("t_rank").cast("long").alias("t_rank"),
            F.col("day").cast("timestamp").alias("day"),
            F.round("v", 6).alias("v"),
        )
    )


@register(
    "ts_trend_robust",
    f"""
WITH {EV},
tr AS (SELECT series_id, t, value FROM ev WHERE t < 100),
pr AS (
  SELECT a.series_id,
         (b.value - a.value) / CAST(b.t - a.t AS DOUBLE) AS slope,
         CASE WHEN b.value > a.value THEN 1
              WHEN b.value < a.value THEN -1 ELSE 0 END AS sgn,
         a.t AS ti, b.t AS tj
  FROM tr a JOIN tr b ON a.series_id = b.series_id AND b.t > a.t
),
med AS (
  SELECT series_id, slope AS ts_slope FROM (
    SELECT series_id, slope,
           row_number() OVER (PARTITION BY series_id ORDER BY slope, ti, tj) AS rn,
           count(*) OVER (PARTITION BY series_id) AS np
    FROM pr
  ) WHERE rn = (np + 1) // 2
),
mk AS (
  SELECT series_id, CAST(sum(sgn) AS BIGINT) AS mk_s FROM pr GROUP BY 1
),
nn AS (SELECT series_id, count(*) AS n FROM tr GROUP BY 1)
SELECT nn.series_id, nn.n,
       round(med.ts_slope, 6) AS ts_slope,
       mk.mk_s,
       round(CASE WHEN mk.mk_s > 0 THEN (mk.mk_s - 1)
                    / sqrt(nn.n * (nn.n - 1) * (2 * nn.n + 5) / 18.0)
                  WHEN mk.mk_s < 0 THEN (mk.mk_s + 1)
                    / sqrt(nn.n * (nn.n - 1) * (2 * nn.n + 5) / 18.0)
                  ELSE 0.0 END, 6) AS mk_z
FROM nn JOIN med USING (series_id) JOIN mk USING (series_id)
""",
)
def ts_trend_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend panel per series — Theil-Sen median slope + the
    Mann-Kendall test (S statistic and continuity-corrected z, no-ties
    variance form; sign handles tied values in S): the
    outlier-resistant trend detection a monitoring pipeline runs where
    least squares breaks. Deterministic: the median is the LOWER
    median order statistic with (slope, t_i, t_j)-pinned ties, S is an
    exact integer sum, and every division/sqrt is a single identical
    IEEE op in both engines. Pairs are generated per series (first 100
    points → ≤4,950 pairs each) by an equi-join on series_id — work is
    n² per KEY, embarrassingly parallel across keys, never a global
    product; at 100 TB the same plan holds with per-series caps."""
    ev = events_as_series(spark, sf_dir).where(F.col("t") < 100)
    return stats.theilsen_mk(ev)


# --------------------------------------------------------------------------
# Granger causality panel (lag-1) over series pairs
# --------------------------------------------------------------------------

#: centered moments from exact integer sums — shared expression text
#: evaluated verbatim by BOTH engines (the ab_cuped_lift discipline)
_GRANGER_CM = """
CAST(n AS DOUBLE) AS nn,
CAST(s_ww AS DOUBLE) - CAST(s_w AS DOUBLE) * CAST(s_w AS DOUBLE) / CAST(n AS DOUBLE) AS sww,
CAST(s_uu AS DOUBLE) - CAST(s_u AS DOUBLE) * CAST(s_u AS DOUBLE) / CAST(n AS DOUBLE) AS suu,
CAST(s_vv AS DOUBLE) - CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE) / CAST(n AS DOUBLE) AS svv,
CAST(s_uw AS DOUBLE) - CAST(s_u AS DOUBLE) * CAST(s_w AS DOUBLE) / CAST(n AS DOUBLE) AS suw,
CAST(s_vw AS DOUBLE) - CAST(s_v AS DOUBLE) * CAST(s_w AS DOUBLE) / CAST(n AS DOUBLE) AS svw,
CAST(s_uv AS DOUBLE) - CAST(s_u AS DOUBLE) * CAST(s_v AS DOUBLE) / CAST(n AS DOUBLE) AS suv
"""

#: restricted/unrestricted RSS and the F statistic — also shared text.
#: rss_r: y_t on y_{t-1}; rss_u: + x_{t-1}; F = (rss_r-rss_u)/(rss_u/(n-3))
_GRANGER_F = """
sww - suw * suw / suu AS rss_r,
sww - (svv * suw * suw - 2 * suv * suw * svw + suu * svw * svw)
      / (suu * svv - suv * suv) AS rss_u,
suu * svv - suv * suv AS det
"""


@register(
    "ts_granger_pairs",
    f"""
WITH ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE user_id < 10
),
lagd AS (
  SELECT series_id, t, c,
         lag(c) OVER (PARTITION BY series_id ORDER BY t) AS cl
  FROM ev WHERE t < 100
),
yx AS (
  SELECT y.series_id AS dst, x.series_id AS src, y.t,
         y.c AS w, y.cl AS u, x.cl AS v
  FROM lagd y JOIN lagd x ON y.t = x.t AND y.series_id <> x.series_id
  WHERE y.cl IS NOT NULL AND x.cl IS NOT NULL
),
mo AS (
  SELECT src, dst, count(*) AS n,
         sum(w) AS s_w, sum(u) AS s_u, sum(v) AS s_v,
         sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)) AS s_ww,
         sum(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS s_uu,
         sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s_vv,
         sum(CAST(u AS HUGEINT) * CAST(w AS HUGEINT)) AS s_uw,
         sum(CAST(v AS HUGEINT) * CAST(w AS HUGEINT)) AS s_vw,
         sum(CAST(u AS HUGEINT) * CAST(v AS HUGEINT)) AS s_uv
  FROM yx GROUP BY 1, 2
),
cm AS (SELECT src, dst, n, {_GRANGER_CM} FROM mo),
fs AS (SELECT src, dst, n, nn, {_GRANGER_F} FROM cm)
SELECT src, dst, CAST(n AS BIGINT) AS n,
       round((rss_r - rss_u) / (rss_u / (nn - 3)), 6) AS f_stat
FROM fs
WHERE det > 0 AND rss_u > 0
""",
)
def ts_granger_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger-causality panel over the first 10 series (90
    directed pairs): F test of whether x_{{t-1}} improves the
    autoregression of y_t — the pairwise causal-screening pass a
    monitoring/feature-discovery pipeline runs before fitting real
    VAR models. Everything reduces to TEN exact integer moment sums
    per pair (cents; products promoted to decimal(38,0)/HUGEINT
    before multiplication), and the closed-form OLS algebra
    (restricted/unrestricted RSS via centered moments, 2x2 normal
    equations by determinant) is ONE shared SQL expression text
    evaluated verbatim by both engines — identical double trees, no
    matrix solver. Degenerate pairs (singular normal equations or
    zero residual) filter on the same predicate in both engines.
    Pair volume is a t-equi-join per ordered pair — at scale the
    screening set is bounded (the pairs you screen), never corpus²."""
    ev = events_as_series(spark, sf_dir).where(
        (F.col("series_id") < 10) & (F.col("t") < 100)
    )
    lagd = ev.select(
        "series_id",
        "t",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
    ).withColumn(
        "cl", F.lag("c").over(Window.partitionBy("series_id").orderBy("t"))
    )
    y = lagd.select(
        F.col("series_id").alias("dst"), "t", F.col("c").alias("w"), F.col("cl").alias("u")
    )
    x = lagd.select(
        F.col("series_id").alias("src"), F.col("t").alias("tx"), F.col("cl").alias("v")
    )
    yx = y.join(
        x, (F.col("t") == F.col("tx")) & (F.col("dst") != F.col("src"))
    ).where(F.col("u").isNotNull() & F.col("v").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    mo = yx.groupBy("src", "dst").agg(
        F.count("*").alias("n"),
        F.sum("w").alias("s_w"),
        F.sum("u").alias("s_u"),
        F.sum("v").alias("s_v"),
        F.sum(dec("w") * dec("w")).alias("s_ww"),
        F.sum(dec("u") * dec("u")).alias("s_uu"),
        F.sum(dec("v") * dec("v")).alias("s_vv"),
        F.sum(dec("u") * dec("w")).alias("s_uw"),
        F.sum(dec("v") * dec("w")).alias("s_vw"),
        F.sum(dec("u") * dec("v")).alias("s_uv"),
    )
    cm = mo.selectExpr("src", "dst", "n", *_GRANGER_CM.strip().split(",\n"))
    fs = cm.selectExpr("src", "dst", "n", "nn", *_GRANGER_F.strip().split(",\n"))
    return fs.where((F.col("det") > 0) & (F.col("rss_u") > 0)).selectExpr(
        "src",
        "dst",
        "CAST(n AS BIGINT) AS n",
        "round((rss_r - rss_u) / (rss_u / (nn - 3)), 6) AS f_stat",
    )
