"""Symbolic representation and diagnostics over per-series time series:
PAA/SAX symbolization, SAX motif counting, CUSUM change-point location,
all-pairs series correlation, seasonal-naive forecast evaluation, and
classical seasonal decomposition.

The reference clusters series by shape after ad-hoc alignment
(/root/reference/app.py:204-217, 246-350); PAA/SAX (Lin et al., DMKD
2007) is the standard scalable symbolic front-end for exactly that
workload — it turns every series into a short word so motif discovery
and candidate pruning become GROUP BYs instead of pairwise scans. All
six plans are pure DataFrame compositions (no UDFs): z-normalization
and CUSUM are window aggregates, PAA is an ordinal-bucket GROUP BY,
symbols are CASE breakpoints, pairing is a keyed self-join. Every plan
shuffles on the series key (or the pair key) with map-side partials and
stays inside whole-stage codegen.

Scale notes (100 TB posture): per-series windows partition on
series_id — state per task is one series span, never the table.
The all-pairs correlation is the one quadratic op here; its scale path
is candidate pruning first (join only pairs that share a SAX word or a
k-means cell from ts_features), which this module's motif table
provides — the full cross-join form below is the exact small-N
baseline the pruned variant is validated against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import (
    events_as_series,
    load_table,
)

# SAX breakpoints for alphabet size 4 (equiprobable N(0,1) quartiles).
_BP = (-0.6745, 0.0, 0.6745)
_SEG_LEN = 8

# Shared oracle CTE: per-series z-scored ordinal series (population
# stddev, zero-variance series dropped), segmented for PAA.
_ZSEG_SQL = """
ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events
),
z AS (
  SELECT series_id, t,
         (value - avg(value) OVER w) / (stddev_pop(value) OVER w) AS z
  FROM ev
  WINDOW w AS (PARTITION BY series_id)
  QUALIFY stddev_pop(value) OVER w > 0
),
seg AS (
  SELECT series_id, t // 8 AS seg, count(*) AS n_pts, avg(z) AS paa
  FROM z GROUP BY 1, 2
),
sym AS (
  SELECT series_id, seg, n_pts, paa,
         CASE WHEN paa < -0.6745 THEN 'a'
              WHEN paa < 0.0     THEN 'b'
              WHEN paa < 0.6745  THEN 'c'
              ELSE 'd' END AS sym
  FROM seg
)
"""


def _sax_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-norm → PAA over ordinal segments → SAX symbol.

    One exchange on series_id: the z-norm whole-partition window and the
    ordinal come from the same partitioning, and the segment GROUP BY
    key (series_id, t div 8) is a refinement of it, so AQE keeps the
    aggregate shuffle-local (partial aggregation does the rest).
    """
    ev = events_as_series(spark, sf_dir)
    w = Window.partitionBy("series_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    z = ev.select(
        "series_id",
        "t",
        ((F.col("value") - mu) / sd).alias("z"),
        sd.alias("_sd"),
    ).where(F.col("_sd") > 0).drop("_sd")
    seg = (
        z.groupBy("series_id", (F.col("t") - F.col("t") % _SEG_LEN).alias("_t0"))
        .agg(F.count("*").alias("n_pts"), F.avg("z").alias("paa"))
        .select(
            "series_id",
            (F.col("_t0") / _SEG_LEN).cast("long").alias("seg"),
            "n_pts",
            "paa",
        )
    )
    sym = (
        F.when(F.col("paa") < _BP[0], "a")
        .when(F.col("paa") < _BP[1], "b")
        .when(F.col("paa") < _BP[2], "c")
        .otherwise("d")
    )
    return seg.withColumn("sym", sym)


@register(
    "ts_paa_sax",
    f"""
WITH {_ZSEG_SQL}
SELECT series_id, seg, n_pts, round(paa, 6) AS paa, sym
FROM sym
""",
)
def ts_paa_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAA + SAX symbolization (segment length 8, alphabet 'a'..'d'):
    the compact symbolic view of every series. Downstream this is the
    index that makes motif search and correlation-pair pruning linear."""
    seg = _sax_segments(spark, sf_dir)
    return seg.select(
        "series_id", "seg", "n_pts", F.round("paa", 6).alias("paa"), "sym"
    )


@register(
    "ts_sax_motifs",
    f"""
WITH {_ZSEG_SQL},
words AS (
  SELECT series_id,
         sym || lead(sym, 1) OVER w || lead(sym, 2) OVER w
             || lead(sym, 3) OVER w AS word
  FROM sym
  WINDOW w AS (PARTITION BY series_id ORDER BY seg)
)
SELECT word, count(*) AS n_occ, count(DISTINCT series_id) AS n_series
FROM words
WHERE word IS NOT NULL
GROUP BY word
HAVING count(*) >= 2
""",
)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide SAX motif table: every 4-segment SAX word occurring
    at least twice, with its occurrence and distinct-series counts.
    Words come from lead() over the segment ordering (reuses the
    segment partitioning — no extra exchange before the word GROUP BY).
    This is the candidate index for motif discovery and for pruning the
    quadratic pair scan in ts_pair_correlation: only series sharing a
    word need comparing."""
    seg = _sax_segments(spark, sf_dir)
    w = Window.partitionBy("series_id").orderBy("seg")
    words = seg.select(
        "series_id",
        F.concat(
            "sym",
            F.lead("sym", 1).over(w),
            F.lead("sym", 2).over(w),
            F.lead("sym", 3).over(w),
        ).alias("word"),
    ).where(F.col("word").isNotNull())
    return (
        words.groupBy("word")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("series_id").alias("n_series"),
        )
        .where(F.col("n_occ") >= 2)
    )


@register(
    "ts_cusum_changepoint",
    """
WITH ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events
),
m AS (
  SELECT series_id, t, value, avg(value) OVER (PARTITION BY series_id) AS mu
  FROM ev
),
c AS (
  SELECT series_id, t,
         sum(value - mu) OVER (PARTITION BY series_id ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM m
),
x AS (
  SELECT series_id, t, s, max(abs(s)) OVER (PARTITION BY series_id) AS s_max
  FROM c
)
SELECT series_id, count(*) AS n,
       min(CASE WHEN abs(s) = s_max THEN t END) AS t_change,
       round(any_value(s_max), 6) AS cusum_max
FROM x
GROUP BY series_id
""",
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point location per series: running sum of
    (value - series mean); the ordinal where |CUSUM| peaks is the
    single most likely mean-shift point (Page 1954 / binary
    segmentation step 1). Ties break to the earliest ordinal, so the
    answer is deterministic. Three window passes share one exchange on
    series_id (mean → running sum → partition max), then a final
    per-series aggregate on the same key — no second shuffle."""
    ev = events_as_series(spark, sf_dir)
    wp = Window.partitionBy("series_id")
    wr = wp.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    m = ev.select(
        "series_id", "t", "value", F.avg("value").over(wp).alias("mu")
    )
    c = m.select(
        "series_id",
        "t",
        F.sum(F.col("value") - F.col("mu")).over(wr).alias("s"),
    )
    x = c.withColumn("s_max", F.max(F.abs("s")).over(wp))
    return x.groupBy("series_id").agg(
        F.count("*").alias("n"),
        F.min(F.when(F.abs("s") == F.col("s_max"), F.col("t"))).alias("t_change"),
        F.round(F.any_value("s_max"), 6).alias("cusum_max"),
    )


_CORR_CAP = 200  # deterministic series sample bounding the exact pair scan


@register(
    "ts_pair_correlation",
    f"""
WITH b0 AS (
  SELECT user_id AS series_id, date_trunc('day', ts) AS bucket, avg(value) AS v
  FROM events GROUP BY 1, 2
),
keep AS (
  SELECT series_id FROM (SELECT DISTINCT series_id FROM b0)
  ORDER BY md5(series_id::VARCHAR), series_id LIMIT {_CORR_CAP}
),
b AS (SELECT b0.* FROM b0 JOIN keep USING (series_id))
SELECT a.series_id AS sid_a, c.series_id AS sid_b,
       count(*) AS n_common, round(corr(a.v, c.v), 6) AS r
FROM b a JOIN b c ON a.bucket = c.bucket AND a.series_id < c.series_id
GROUP BY 1, 2
HAVING count(*) >= 20
""",
)
def ts_pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs Pearson correlation between series over their
    daily rollups (co-movement discovery; feeds correlation-graph
    clustering) — the EXACT BASELINE of the family, capped to a
    deterministic sample so its quadratic pair scan is bounded at any
    corpus size: the {_CORR_CAP} series with the smallest
    md5(series_id) (a stable, engine-reproducible sample — the
    sample_hash_bernoulli discipline, here with a fixed COUNT so the
    pair budget is a constant ≤ cap²/2 even at 1000× the series).
    Below the cap (sf0.01's 150 series) the output is identical to the
    uncapped form. Shape: daily rollup (one shuffle), top-cap sample
    broadcast back as a semi-join, self-join on the day bucket,
    pair-keyed aggregate with map-side partials; pairs sharing <20
    days drop. The UNCAPPED corpus-wide form of this query is
    spectral_plans.ts_corr_sax_pruned — the SAX-word candidate filter
    that turns the bucket join into a sparse pair join; this exact
    kernel is its measuring stick."""
    ev = load_table(spark, sf_dir, "events")
    b0 = (
        ev.groupBy(
            F.col("user_id").alias("series_id"),
            F.date_trunc("day", F.col("ts")).alias("bucket"),
        )
        .agg(F.avg("value").alias("v"))
    )
    keep = (
        b0.select("series_id")
        .distinct()
        .orderBy(F.md5(F.col("series_id").cast("string")), F.col("series_id"))
        .limit(_CORR_CAP)
    )
    b = b0.join(F.broadcast(keep), "series_id", "left_semi")
    a = b.select(
        F.col("series_id").alias("sid_a"), "bucket", F.col("v").alias("va")
    )
    c = b.select(
        F.col("series_id").alias("sid_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(
        c,
        (F.col("bucket") == F.col("bucket_b")) & (F.col("sid_a") < F.col("sid_b")),
    )
    return (
        pairs.groupBy("sid_a", "sid_b")
        .agg(
            F.count("*").alias("n_common"),
            F.round(F.corr("va", "vb"), 6).alias("r"),
        )
        .where(F.col("n_common") >= 20)
    )


@register(
    "ts_seasonal_naive_eval",
    """
WITH b AS (
  SELECT user_id AS series_id, date_trunc('day', ts) AS bucket,
         round(avg(value), 6) AS v
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT b.series_id, count(*) AS n_eval,
         sum(CAST(round(abs(b.v - n1.v) * 1000000) AS BIGINT)) AS s1_us,
         sum(CAST(round(abs(b.v - n7.v) * 1000000) AS BIGINT)) AS s7_us
  FROM b
  JOIN b n1 ON n1.series_id = b.series_id AND n1.bucket = b.bucket - to_days(1)
  JOIN b n7 ON n7.series_id = b.series_id AND n7.bucket = b.bucket - to_days(7)
  GROUP BY b.series_id
  HAVING count(*) >= 10
)
SELECT series_id, n_eval,
       floor(s1_us * 1.0 / n_eval + 0.5) / 1000000 AS mae_naive,
       floor(s7_us * 1.0 / n_eval + 0.5) / 1000000 AS mae_seasonal,
       floor((1.0 - s7_us * 1.0 / s1_us) * 1000000 + 0.5) / 1000000 AS skill
FROM m
""",
)
def ts_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation per series: MAE of the naive
    forecast (yesterday's value) vs the weekly seasonal-naive forecast
    (value 7 days back) over the daily rollup, plus the skill ratio
    (how much weekly seasonality explains — the model-selection signal
    a forecasting pipeline gates on, and the denominator convention of
    MASE). Keyed self-joins on (series, bucket-lag) — gaps pair
    correctly where a row-offset lag() would misalign (same reasoning
    as ts_acf_daily); all three sides share the rollup partitioning.

    Cross-engine determinism: the rollup value is rounded to 6 dp, so
    each |error| is an exact multiple of 1e-6 — the per-series error
    SUMS are therefore accumulated as integer MICRO-UNITS (BIGINT),
    which no shuffle-merge order can perturb, and the final MAE /
    skill values derive from those exact integers via the floor(x·1e6
    + 0.5) HALF_UP identity both engines evaluate identically. A
    double avg() here was flaky: with n_eval=112 the true mean can sit
    exactly on a 6-dp half boundary, where last-ulp sum-order noise
    flips the rounded digit run-to-run."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.col("user_id").alias("series_id"),
            F.date_trunc("day", F.col("ts")).alias("bucket"),
        )
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    n1 = b.select(
        F.col("series_id").alias("s1"),
        F.col("bucket").alias("b1"),
        F.col("v").alias("v1"),
    )
    n7 = b.select(
        F.col("series_id").alias("s7"),
        F.col("bucket").alias("b7"),
        F.col("v").alias("v7"),
    )
    j = b.join(
        n1,
        (F.col("s1") == F.col("series_id"))
        & (F.col("b1") == F.expr("timestampadd(DAY, -1, bucket)")),
    ).join(
        n7,
        (F.col("s7") == F.col("series_id"))
        & (F.col("b7") == F.expr("timestampadd(DAY, -7, bucket)")),
    )
    us1 = F.round(F.abs(F.col("v") - F.col("v1")) * 1e6, 0).cast("long")
    us7 = F.round(F.abs(F.col("v") - F.col("v7")) * 1e6, 0).cast("long")
    m = (
        j.groupBy("series_id")
        .agg(
            F.count("*").alias("n_eval"),
            F.sum(us1).alias("s1_us"),
            F.sum(us7).alias("s7_us"),
        )
        .where(F.col("n_eval") >= 10)
    )
    half_up = lambda c: F.floor(c + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return m.select(
        "series_id",
        "n_eval",
        half_up(F.col("s1_us") * F.lit(1.0) / F.col("n_eval")).alias("mae_naive"),
        half_up(F.col("s7_us") * F.lit(1.0) / F.col("n_eval")).alias("mae_seasonal"),
        half_up(
            (F.lit(1.0) - F.col("s7_us") * F.lit(1.0) / F.col("s1_us")) * F.lit(1e6)
        ).alias("skill"),
    )


@register(
    "ts_decompose_dow",
    """
WITH b AS (
  SELECT user_id AS series_id, date_trunc('day', ts) AS bucket,
         CAST(floor(CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS v_us
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT series_id, bucket, v_us,
         CAST(floor(CAST(sum(v_us) OVER w AS DOUBLE)
                    / (count(*) OVER w) + 0.5) AS BIGINT) AS trend_us
  FROM b
  WINDOW w AS (PARTITION BY series_id
               ORDER BY cast(floor(epoch(bucket)) AS BIGINT)
               RANGE BETWEEN 259200 PRECEDING AND 259200 FOLLOWING)
),
se AS (
  SELECT series_id, bucket, v_us, trend_us,
         CAST(floor(CAST(sum(v_us - trend_us) OVER w2 AS DOUBLE)
                    / (count(*) OVER w2) + 0.5) AS BIGINT) AS seasonal_us
  FROM tr
  WINDOW w2 AS (PARTITION BY series_id, dayofweek(bucket) + 1)
)
SELECT series_id, bucket::TIMESTAMP AS bucket, v_us / 1e6 AS v,
       trend_us / 1e6 AS trend, seasonal_us / 1e6 AS seasonal,
       (v_us - trend_us - seasonal_us) / 1e6 AS resid
FROM se
""",
)
def ts_decompose_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily rollup: trend =
    centered ±3-day time-RANGE mean (gap-safe — a rows frame would slip
    across missing days), seasonal = day-of-week mean of the detrended
    value per series, residual = remainder (the anomaly input). Both
    windows and the rollup partition on series_id, so the whole
    decomposition is one exchange; the seasonal window refines the
    partitioning (series, dow) without re-shuffling more than the
    Window operator's local sort.

    PARITY DISCIPLINE: values quantize to 6-dp MICRO-units (int64) on
    ingest and every mean in the chain is an exact integer micro-sum
    + one division + half-up floor back to integer micro-units — the
    c3b association-order-proof form. The original F.avg chain flaked
    once at sf0.01 (a resid within an ulp of a 0.5e-6 boundary flipped
    between Spark's partial-aggregation order and DuckDB's segment-
    tree window sums — the documented probabilistic caveat, observed
    in the wild round 5), so this query carries the exact form."""
    ev = load_table(spark, sf_dir, "events")
    val_us = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    b = (
        ev.groupBy(
            F.col("user_id").alias("series_id"),
            F.date_trunc("day", F.col("ts")).alias("bucket"),
        )
        .agg(
            F.floor(
                F.sum(val_us).cast("double") / F.count("*") + F.lit(0.5)
            )
            .cast("long")
            .alias("v_us")
        )
    )
    w_tr = (
        Window.partitionBy("series_id")
        .orderBy(F.col("bucket").cast("long"))
        .rangeBetween(-259200, 259200)
    )
    tr = b.withColumn(
        "trend_us",
        F.floor(
            F.sum("v_us").over(w_tr).cast("double")
            / F.count("*").over(w_tr)
            + F.lit(0.5)
        ).cast("long"),
    )
    w_se = Window.partitionBy("series_id", F.dayofweek("bucket"))
    se = tr.withColumn(
        "seasonal_us",
        F.floor(
            F.sum(F.col("v_us") - F.col("trend_us")).over(w_se).cast("double")
            / F.count("*").over(w_se)
            + F.lit(0.5)
        ).cast("long"),
    )
    return se.select(
        "series_id",
        "bucket",
        (F.col("v_us") / F.lit(1e6)).alias("v"),
        (F.col("trend_us") / F.lit(1e6)).alias("trend"),
        (F.col("seasonal_us") / F.lit(1e6)).alias("seasonal"),
        (
            (F.col("v_us") - F.col("trend_us") - F.col("seasonal_us"))
            / F.lit(1e6)
        ).alias("resid"),
    )


@register(
    "ts_anomaly_mad",
    """
WITH ev AS (
  SELECT user_id AS series_id, event_id, value FROM events
),
m1 AS (
  SELECT series_id, median(value) AS med FROM ev GROUP BY 1
),
m2 AS (
  SELECT ev.series_id, median(abs(value - med)) AS mad
  FROM ev JOIN m1 USING (series_id) GROUP BY 1
)
SELECT ev.series_id, event_id, round(value, 6) AS value,
       round(0.6745 * (value - med) / mad, 6) AS robust_z
FROM ev JOIN m1 USING (series_id) JOIN m2 USING (series_id)
WHERE mad > 0 AND abs(0.6745 * (value - med) / mad) > 3.5
""",
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series outliers: modified z-score 0.6745·(x-med)/MAD
    > 3.5 (Iglewicz & Hoaglin 1993) — unlike ts_anomaly_zscore, the
    median/MAD location and scale are not dragged by the outliers they
    are meant to flag. Two exact-median aggregates on the series key;
    both per-series stat tables are tiny (one row per series) and
    broadcast back, so the raw events are scanned twice but never
    shuffled — at fleet scale that is two columnar scans and one
    small-key aggregate pair instead of any events-wide exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series_id"), "event_id", "value"
    )
    m1 = ev.groupBy("series_id").agg(F.median("value").alias("med"))
    with_med = ev.join(F.broadcast(m1), "series_id")
    m2 = with_med.groupBy("series_id").agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    rz = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        with_med.join(F.broadcast(m2), "series_id")
        .where((F.col("mad") > 0) & (F.abs(rz) > 3.5))
        .select(
            "series_id",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(rz, 6).alias("robust_z"),
        )
    )


@register(
    "ts_anomaly_prequential",
    """
WITH ev AS (
  SELECT user_id AS series_id, event_id, ts, value FROM events
),
h AS (
  SELECT series_id, event_id, value,
         count(*) OVER w AS n_prev,
         avg(value) OVER w AS mu,
         var_pop(value) OVER w AS vp
  FROM ev
  WINDOW w AS (PARTITION BY series_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT series_id, event_id, round(value, 6) AS value,
       round((value - mu) / sqrt(vp), 6) AS z
FROM h
WHERE n_prev >= 10 AND vp > 0 AND abs((value - mu) / sqrt(vp)) > 3
""",
)
def ts_anomaly_prequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prequential (history-only) per-series anomaly flags: each event
    scored against the mean/variance of STRICTLY EARLIER events in its
    series — the honest online evaluation (ts_anomaly_zscore's
    whole-series stats peek at the future; this is what a deployed
    detector actually sees), after a 10-event burn-in. One exchange on
    series_id; the window frame ends at 1 PRECEDING, so Spark streams
    it with O(1) state per row. The streaming twin is
    streaming/ops.streaming_anomaly_zscore (same flags, Welford
    state)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series_id"), "event_id", "ts", "value"
    )
    w = (
        Window.partitionBy("series_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    h = ev.select(
        "series_id",
        "event_id",
        "value",
        F.count("*").over(w).alias("n_prev"),
        F.avg("value").over(w).alias("mu"),
        F.var_pop("value").over(w).alias("vp"),
    )
    z = (F.col("value") - F.col("mu")) / F.sqrt("vp")
    return (
        h.where((F.col("n_prev") >= 10) & (F.col("vp") > 0) & (F.abs(z) > 3))
        .select(
            "series_id",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("z"),
        )
    )


@register(
    "ts_motif_verified",
    f"""
WITH {_ZSEG_SQL},
words AS (
  SELECT series_id, seg AS w,
         sym || lead(sym, 1) OVER ws || lead(sym, 2) OVER ws
             || lead(sym, 3) OVER ws AS word,
         least(n_pts, lead(n_pts, 1) OVER ws, lead(n_pts, 2) OVER ws,
               lead(n_pts, 3) OVER ws) AS min_pts
  FROM sym WINDOW ws AS (PARTITION BY series_id ORDER BY seg)
),
wok AS (SELECT series_id, w, word FROM words
        WHERE word IS NOT NULL AND min_pts = 8),
arrz AS (SELECT series_id, list(z ORDER BY t) AS zs FROM z GROUP BY 1),
win AS (
  SELECT k.series_id, k.w, k.word,
         a.zs[k.w * 8 + 1 : k.w * 8 + 32] AS zw
  FROM wok k JOIN arrz a USING (series_id)
  WHERE len(a.zs) >= k.w * 8 + 32
),
cap AS (
  SELECT series_id, w, word, zw,
         row_number() OVER (PARTITION BY word
           ORDER BY md5(series_id::VARCHAR || ',' || w::VARCHAR),
                    series_id, w) AS rk
  FROM win
),
wm AS (
  SELECT series_id, w, word, zw,
         list_aggregate(zw, 'sum') / 32 AS m
  FROM cap WHERE rk <= 50
),
wsd AS (
  SELECT series_id, w, word, zw, m,
         sqrt(list_aggregate(list_transform(zw, x -> (x - m) * (x - m)),
                             'sum') / 32) AS s
  FROM wm
),
zn AS (
  SELECT series_id, w, word,
         list_transform(zw, x -> (x - m) / s) AS zn
  FROM wsd WHERE s > 0
),
pd AS (
  SELECT a.word, a.series_id AS sid_a, a.w AS w_a,
         b.series_id AS sid_b, b.w AS w_b,
         sqrt(greatest(
           64.0 - 2.0 * list_aggregate(
             list_transform(range(1, 33), k -> a.zn[k] * b.zn[k]), 'sum'),
           0.0)) AS dist
  FROM zn a JOIN zn b
    ON a.word = b.word
   AND (a.series_id < b.series_id
        OR (a.series_id = b.series_id AND b.w >= a.w + 4))
),
best AS (
  SELECT word, sid_a, w_a, sid_b, w_b, dist,
         row_number() OVER (PARTITION BY word
           ORDER BY floor(dist * 1e6 + 0.5) / 1e6,
                    sid_a, w_a, sid_b, w_b) AS rn
  FROM pd
)
SELECT word, sid_a, w_a, sid_b, w_b, round(dist, 6) AS dist
FROM best WHERE rn = 1
""",
)
def ts_motif_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best exactly-verified motif pair per repeated SAX word over the
    events series: SAX-bucket candidate pruning (linear) + z-normalized
    Euclidean verification on the raw 32-point windows (bounded
    quadratic per bucket, capped at 50 md5-ordered windows/word) —
    the scalable skeleton of matrix-profile motif discovery
    (operators/motifs.py). Full value-hash oracle: the DuckDB twin
    replays the identical pipeline on the shared _ZSEG_SQL base
    (portable md5 cap order; window z-norm as sequential sum/len; the
    pair dot product's ≤1-ulp einsum drift neutralized by keying the
    best-pair selection on half-up-6dp-rounded dist in BOTH engines).
    Planted-motif recovery is additionally pinned in
    tests/test_symbolic.py."""
    from the_framework_for_clustering_time_series_data_spark.operators import motifs

    return motifs.verified_motifs(events_as_series(spark, sf_dir), cap_hash="md5")


@register(
    "ts_anomaly_seasonal",
    """
WITH b AS (
  SELECT user_id AS series_id, date_trunc('day', ts) AS bucket,
         CAST(floor(CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                    / count(*) + 0.5) AS BIGINT) AS v_us
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT series_id, bucket, v_us,
         CAST(floor(CAST(sum(v_us) OVER w AS DOUBLE)
                    / (count(*) OVER w) + 0.5) AS BIGINT) AS trend_us
  FROM b
  WINDOW w AS (PARTITION BY series_id
               ORDER BY cast(floor(epoch(bucket)) AS BIGINT)
               RANGE BETWEEN 259200 PRECEDING AND 259200 FOLLOWING)
),
se AS (
  SELECT series_id, bucket, v_us, trend_us,
         CAST(floor(CAST(sum(v_us - trend_us) OVER w2 AS DOUBLE)
                    / (count(*) OVER w2) + 0.5) AS BIGINT) AS seasonal_us
  FROM tr
  WINDOW w2 AS (PARTITION BY series_id, dayofweek(bucket) + 1)
),
r AS (
  SELECT series_id, bucket, v_us,
         (v_us - trend_us - seasonal_us) / 1e6 AS resid
  FROM se
),
s AS (
  SELECT series_id, bucket, v_us, resid,
         stddev_pop(resid) OVER (PARTITION BY series_id) AS sd
  FROM r
)
SELECT series_id, bucket::TIMESTAMP AS bucket, v_us / 1e6 AS v, resid,
       round(resid / sd, 6) AS resid_z
FROM s WHERE sd > 0 AND abs(resid) > 2.5 * sd
""",
)
def ts_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection: days whose decomposition
    RESIDUAL (ts_decompose_dow's trend + day-of-week model) exceeds
    2.5 per-series residual sigmas — catches a Tuesday that is wild
    FOR A TUESDAY even when its raw value is unremarkable, the miss
    class of ts_anomaly_zscore's raw-value screen.

    PARITY DISCIPLINE: the decomposition chain carries the same exact
    integer micro-unit means as ts_decompose_dow (the chained-mean
    6-dp boundary flake observed round 5), so the resid both engines
    feed to the sigma pass is the identical exact 6-dp quantum; the
    sigma ratio and threshold comparison are association-safe because
    stddev_pop's square root is irrational (a boundary tie has
    measure zero).

    Shape: the whole chain — rollup, trend time-RANGE window, seasonal
    (series, dow) window, sigma whole-partition window, flag filter —
    partitions by series_id; one exchange end-to-end like the
    decomposition itself."""
    ev = load_table(spark, sf_dir, "events")
    val_us = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    b = ev.groupBy(
        F.col("user_id").alias("series_id"),
        F.date_trunc("day", F.col("ts")).alias("bucket"),
    ).agg(
        F.floor(F.sum(val_us).cast("double") / F.count("*") + F.lit(0.5))
        .cast("long")
        .alias("v_us")
    )
    w_tr = (
        Window.partitionBy("series_id")
        .orderBy(F.col("bucket").cast("long"))
        .rangeBetween(-259200, 259200)
    )
    tr = b.withColumn(
        "trend_us",
        F.floor(
            F.sum("v_us").over(w_tr).cast("double")
            / F.count("*").over(w_tr)
            + F.lit(0.5)
        ).cast("long"),
    )
    w_se = Window.partitionBy("series_id", F.dayofweek("bucket"))
    se = tr.withColumn(
        "seasonal_us",
        F.floor(
            F.sum(F.col("v_us") - F.col("trend_us")).over(w_se).cast("double")
            / F.count("*").over(w_se)
            + F.lit(0.5)
        ).cast("long"),
    )
    r = se.select(
        "series_id",
        "bucket",
        "v_us",
        (
            (F.col("v_us") - F.col("trend_us") - F.col("seasonal_us"))
            / F.lit(1e6)
        ).alias("resid"),
    )
    w_sd = Window.partitionBy("series_id")
    s = r.withColumn("sd", F.stddev_pop("resid").over(w_sd))
    return s.where(
        (F.col("sd") > 0) & (F.abs(F.col("resid")) > 2.5 * F.col("sd"))
    ).select(
        "series_id",
        "bucket",
        (F.col("v_us") / F.lit(1e6)).alias("v"),
        "resid",
        F.round(F.col("resid") / F.col("sd"), 6).alias("resid_z"),
    )


@register(
    "ts_cusum_variance",
    """
WITH ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events
),
m AS (
  SELECT series_id, t, value,
         avg(value) OVER (PARTITION BY series_id) AS mu
  FROM ev
),
q AS (
  SELECT series_id, t,
         (value - mu) * (value - mu) AS sq,
         avg((value - mu) * (value - mu))
           OVER (PARTITION BY series_id) AS var_pop
  FROM m
),
c AS (
  SELECT series_id, t,
         sum(sq - var_pop) OVER (PARTITION BY series_id ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM q
),
x AS (
  SELECT series_id, t, s,
         max(abs(s)) OVER (PARTITION BY series_id) AS s_max
  FROM c
)
SELECT series_id, count(*) AS n,
       min(CASE WHEN abs(s) = s_max THEN t END) AS t_change,
       round(any_value(s_max), 6) AS cusum_max
FROM x GROUP BY series_id
""",
)
def ts_cusum_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-change-point location per series: CUSUM over SQUARED
    deviations from the series mean — peaks where the volatility
    regime shifts, the heteroscedasticity twin of
    ts_cusum_changepoint's mean-shift locator (a pure level shift
    leaves this statistic flat where the mean CUSUM spikes, so the
    pair separates the two regime-change classes). Earliest-argmax
    tie-break; same single series exchange stacking the mean window,
    variance window, running sum, partition max, and final aggregate."""
    ev = events_as_series(spark, sf_dir)
    wp = Window.partitionBy("series_id")
    wr = wp.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    m = ev.withColumn("mu", F.avg("value").over(wp))
    q = m.withColumn("sq", (F.col("value") - F.col("mu")) ** 2).withColumn(
        "var_pop", F.avg((F.col("value") - F.col("mu")) ** 2).over(wp)
    )
    c = q.withColumn("s", F.sum(F.col("sq") - F.col("var_pop")).over(wr))
    x = c.withColumn("s_max", F.max(F.abs("s")).over(wp))
    return x.groupBy("series_id").agg(
        F.count("*").alias("n"),
        F.min(F.when(F.abs("s") == F.col("s_max"), F.col("t"))).alias("t_change"),
        F.round(F.any_value("s_max"), 6).alias("cusum_max"),
    )


@register(
    "ts_ordinal_patterns",
    """
WITH ev AS (
  SELECT user_id AS series_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events
),
tri AS (
  SELECT series_id, t, value AS a,
         lead(value, 1) OVER (PARTITION BY series_id ORDER BY t) AS b,
         lead(value, 2) OVER (PARTITION BY series_id ORDER BY t) AS c
  FROM ev
),
pat AS (
  SELECT series_id,
         CASE
           WHEN a <= b AND b <= c THEN 0
           WHEN a <= c AND c < b  THEN 1
           WHEN b < a  AND a <= c THEN 2
           WHEN c < a  AND a <= b THEN 3
           WHEN b <= c AND c < a  THEN 4
           ELSE 5
         END AS pattern
  FROM tri WHERE b IS NOT NULL AND c IS NOT NULL
)
SELECT series_id, pattern, count(*) AS n
FROM pat GROUP BY 1, 2
""",
)
def ts_ordinal_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-pattern profile (Bandt & Pompe's permutation-entropy
    substrate, m=3): every length-3 window of a series maps to one of
    six order patterns via PURE integer-free comparisons (ties broken
    toward ascending, the standard convention), and the per-series
    pattern histogram is the complexity fingerprint — white noise is
    uniform across patterns, monotone trends concentrate on 0/5,
    regime changes shift the mass. Deterministic by construction (no
    arithmetic at all, only comparisons); the entropy scalarization is
    left to the consumer because ln() is the one transcendental the
    parity discipline excludes. Two leads on one per-series window +
    a grouped count — single exchange."""
    ev = events_as_series(spark, sf_dir)
    w = Window.partitionBy("series_id").orderBy("t")
    tri = ev.select(
        "series_id",
        F.col("value").alias("a"),
        F.lead("value", 1).over(w).alias("b"),
        F.lead("value", 2).over(w).alias("c"),
    ).where(F.col("b").isNotNull() & F.col("c").isNotNull())
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    pattern = (
        F.when((a <= b) & (b <= c), 0)
        .when((a <= c) & (c < b), 1)
        .when((b < a) & (a <= c), 2)
        .when((c < a) & (a <= b), 3)
        .when((b <= c) & (c < a), 4)
        .otherwise(5)
    )
    return (
        tri.select("series_id", pattern.alias("pattern"))
        .groupBy("series_id", "pattern")
        .agg(F.count("*").alias("n"))
    )
