"""Data-quality surface: column profiling and declarative constraint
checks (the Deequ/Great-Expectations role) — what a production pipeline
runs before trusting a 100 TB drop of new data.

Both plans are ONE aggregate pass over the table (every metric is an
algebraic/conditional aggregate computed simultaneously), reshaped to
long form driver-side from a single collected row of scalars — no
per-metric scans, no driver loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

_PROFILE_COLS = ("event_id", "user_id", "event_type", "value", "props")


@register(
    "profile_events_columns",
    """
WITH a AS (
  SELECT count(*) AS n,
         {metrics}
  FROM events
)
SELECT * FROM a
""".replace(
        "{metrics}",
        ",\n         ".join(
            f"count(*) - count({c}) AS null_{c}, "
            f"count(DISTINCT {c}) AS distinct_{c}"
            for c in _PROFILE_COLS
        ),
    ),
)
def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the events table: row count plus per-column
    null count and exact distinct count, all in ONE aggregate (the
    multi-distinct plan Catalyst compiles via Expand — one scan, no
    per-column passes). Output is a single wide row; the scale story
    is that profiling cost is a constant number of scans regardless of
    how many columns are profiled."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n")]
    for c in _PROFILE_COLS:
        aggs.append((F.count("*") - F.count(c)).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"distinct_{c}"))
    return ev.agg(*aggs)


@register(
    "dq_checks_events",
    """
WITH a AS (
  SELECT count(*) AS n,
         avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END) AS value_null_rate,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
                    OR ts >= TIMESTAMP '2025-01-01' THEN 1 ELSE 0 END) AS ts_out,
         sum(CASE WHEN event_type NOT IN
               ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS bad_type,
         sum(CASE WHEN user_id <= 0 THEN 1 ELSE 0 END) AS bad_user,
         count(*) - count(DISTINCT event_id) AS dup_ids
  FROM events
)
SELECT c.check_name, c.passed, c.observed
FROM a, LATERAL (VALUES
  ('row_count_positive',   n > 0,                round(n, 6)),
  ('value_null_rate_lt_1pct', value_null_rate < 0.01, round(value_null_rate, 6)),
  ('ts_within_2024',       ts_out = 0,           round(ts_out, 6)),
  ('event_type_in_domain', bad_type = 0,         round(bad_type, 6)),
  ('user_id_positive',     bad_user = 0,         round(bad_user, 6)),
  ('event_id_unique',      dup_ids = 0,          round(dup_ids, 6))
) AS c(check_name, passed, observed)
""",
)
def dq_checks_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over events — six checks (row count,
    null rate, timestamp domain, categorical domain, key positivity,
    key uniqueness) evaluated from ONE aggregate pass, emitted as a
    long-form (check, passed, observed) verdict table. At fleet scale
    this is the admission gate a new data drop must pass before joining
    the corpus; cost is one scan however many checks are declared."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.agg(
        F.count("*").alias("n"),
        F.avg(F.when(F.col("value").isNull(), 1.0).otherwise(0.0)).alias(
            "value_null_rate"
        ),
        F.sum(
            F.when(
                (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2025-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("ts_out"),
        F.sum(
            F.when(
                ~F.col("event_type").isin(
                    "click", "view", "purchase", "signup", "error"
                ),
                1,
            ).otherwise(0)
        ).alias("bad_type"),
        F.sum(F.when(F.col("user_id") <= 0, 1).otherwise(0)).alias("bad_user"),
        (F.count("*") - F.countDistinct("event_id")).alias("dup_ids"),
    )
    checks = F.array(
        F.struct(
            F.lit("row_count_positive").alias("check_name"),
            (F.col("n") > 0).alias("passed"),
            F.round(F.col("n").cast("double"), 6).alias("observed"),
        ),
        F.struct(
            F.lit("value_null_rate_lt_1pct").alias("check_name"),
            (F.col("value_null_rate") < 0.01).alias("passed"),
            F.round("value_null_rate", 6).alias("observed"),
        ),
        F.struct(
            F.lit("ts_within_2024").alias("check_name"),
            (F.col("ts_out") == 0).alias("passed"),
            F.round(F.col("ts_out").cast("double"), 6).alias("observed"),
        ),
        F.struct(
            F.lit("event_type_in_domain").alias("check_name"),
            (F.col("bad_type") == 0).alias("passed"),
            F.round(F.col("bad_type").cast("double"), 6).alias("observed"),
        ),
        F.struct(
            F.lit("user_id_positive").alias("check_name"),
            (F.col("bad_user") == 0).alias("passed"),
            F.round(F.col("bad_user").cast("double"), 6).alias("observed"),
        ),
        F.struct(
            F.lit("event_id_unique").alias("check_name"),
            (F.col("dup_ids") == 0).alias("passed"),
            F.round(F.col("dup_ids").cast("double"), 6).alias("observed"),
        ),
    )
    return a.select(F.explode(checks).alias("c")).select(
        "c.check_name", "c.passed", "c.observed"
    )


@register(
    "priv_k_anonymity",
    """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         count(*) AS class_size,
         count(DISTINCT CAST(floor(c_acctbal / 1000) AS INT)) AS l_div
  FROM customer
  GROUP BY 1, 2
),
g AS (SELECT min(class_size) AS k_anonymity, min(l_div) AS l_diversity FROM cls)
SELECT c.c_nationkey, c.c_mktsegment, c.class_size, c.l_div,
       c.class_size < 5 AS suppress,
       g.k_anonymity, g.l_diversity
FROM cls c, g
""",
)
def priv_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit for release/training-data governance (Sweeney's
    k-anonymity + distinct l-diversity), the structured-data
    counterpart of text_pii_redact: quasi-identifier classes
    (nation x market segment) with their size and the diversity of the
    sensitive attribute (account-balance tier), the global k and l
    (worst class), and a per-class suppression flag (k < 5 — the
    classes a release pipeline must generalize or drop). ONE grouped
    aggregate over the table + a broadcast of the two global minima;
    at 100 TB the audit is a single map-side-combined shuffle on the
    QI key."""
    c = load_table(spark, sf_dir, "customer")
    cls = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / 1000).cast("int")
        ).alias("l_div"),
    )
    g = cls.agg(
        F.min("class_size").alias("k_anonymity"),
        F.min("l_div").alias("l_diversity"),
    )
    return cls.crossJoin(F.broadcast(g)).select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        "l_div",
        (F.col("class_size") < 5).alias("suppress"),
        "k_anonymity",
        "l_diversity",
    )


#: Benford first-digit probabilities log10(1+1/d), d=1..9, as IEEE-double
#: literals (the Poisson-threshold discipline: constants are embedded,
#: never re-derived in-plan, so both engines compare identical doubles).
_BENFORD_P = (
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
)

_BENFORD_VALS = ", ".join(f"({d}, {p!r})" for d, p in enumerate(_BENFORD_P, 1))


@register(
    "dq_benford_firstdigit",
    f"""
WITH fd AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
obs AS (SELECT digit, count(*) AS n_obs FROM fd GROUP BY 1),
tot AS (SELECT sum(n_obs) AS n FROM obs),
j AS (
  SELECT b.digit, CAST(b.p AS DOUBLE) AS p, coalesce(o.n_obs, 0) AS n_obs, t.n
  FROM (VALUES {_BENFORD_VALS}) AS b(digit, p)
  LEFT JOIN obs o USING (digit) CROSS JOIN tot t
)
SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
       round(CAST(n_obs AS DOUBLE) / n, 6) AS freq,
       round(p, 6) AS benford_p,
       round((CAST(n_obs AS DOUBLE) - n * p) * (CAST(n_obs AS DOUBLE) - n * p)
             / (n * p), 6) AS chi2_term
FROM j
""",
)
def dq_benford_firstdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the classic
    fabricated-data / unit-mix detector a data-quality gate runs on
    monetary columns: observed leading-digit frequencies against the
    Benford expectation with per-digit chi-square terms (sum them for
    the 8-df statistic). The expectation log10(1+1/d) is embedded as
    IEEE-double LITERALS (never computed in-plan — the Poisson
    threshold-table discipline), so every arithmetic step is an
    identical double op in both engines; the integer truncation is an
    explicit floor() (DuckDB's double->BIGINT cast ROUNDS while
    Spark's truncates — a silent one-digit disagreement otherwise).
    One scan + a 9-row broadcast join at any scale."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    fd = o.select(
        F.substring(F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    obs = fd.groupBy("digit").agg(F.count("*").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    b = spark.createDataFrame(
        [(d, p) for d, p in enumerate(_BENFORD_P, 1)], "digit int, p double"
    )
    j = (
        b.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            "p",
            "n",
        )
    )
    dev = F.col("n_obs").cast("double") - F.col("n") * F.col("p")
    return j.select(
        "digit",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias("freq"),
        F.round("p", 6).alias("benford_p"),
        F.round(dev * dev / (F.col("n") * F.col("p")), 6).alias("chi2_term"),
    )


#: two-sided geometric mechanism (eps = 1, alpha = e^-1) cumulative
#: thresholds on a 60-bit uniform, noise order 0, +1, -1, +2, -2, ...,
#: +-19; IEEE-double-derived literals (the Poisson-table discipline:
#: the table IS the definition, never re-derived in-plan). Residual
#: tail mass ~3e-9 clamps to +20.
_GEO_T60 = (
    532784808252849344, 728785385777541632, 924785963302233856,
    996890546231297664, 1068995129160361472, 1095520922834205312,
    1122046716508049152, 1131804339802585344, 1141561963097121536,
    1145151549800839168, 1148741136504556800, 1150061719764529664,
    1151382303024502528, 1151868139432477952, 1152353975840453376,
    1152532692812563456, 1152711409784673536, 1152777157868373504,
    1152842905952073472, 1152867093425825536, 1152891280899577600,
    1152900178774592000, 1152909076649606400, 1152912349715086592,
    1152915622780566784, 1152916826884417792, 1152918030988268800,
    1152918473984191744, 1152918916980114688, 1152919079951399168,
    1152919242922683648, 1152919302879135232, 1152919362835586816,
    1152919384892916992, 1152919406950247168, 1152919415064297728,
    1152919423178348288, 1152919426163433216, 1152919429148518144,
)


def _geo_noise_k(i: int) -> int:
    return 0 if i == 0 else (i + 1) // 2 if i % 2 == 1 else -(i // 2)


def _geo_case_sql(h: str) -> str:
    branches = "\n         ".join(
        f"WHEN {h} < {t} THEN {_geo_noise_k(i)}"
        for i, t in enumerate(_GEO_T60)
    )
    return f"CASE {branches}\n         ELSE 20 END"


@register(
    "priv_dp_counts",
    f"""
WITH g AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
z AS (
  SELECT event_type, day, n,
         CAST(('0x' || substr(md5(event_type || ':' || CAST(epoch_ns(day) // 1000 AS VARCHAR) || ':dp'), 1, 15)) AS BIGINT) AS h
  FROM g
)
SELECT event_type, CAST(epoch_ns(day) // 1000 AS BIGINT) AS day_us,
       CAST(greatest(0, n + {_geo_case_sql("h")}) AS BIGINT) AS noisy_n
FROM z
""",
)
def priv_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release plumbing: per-(type, day) counts
    through the two-sided GEOMETRIC mechanism (Ghosh-Roughgarden-
    Sundararajan, the discrete Laplace — eps = 1), clamped at zero.
    HONESTY NOTE: the noise here is md5-keyed, which makes the
    mechanism REPLAYABLE for testing (this oracle) but NOT private —
    a production release swaps the hash for a real RNG and this plan
    is exactly the release query it runs. The inverse-CDF walk is a
    39-branch threshold CASE over embedded integer literals (the
    Poisson-table discipline; tail mass ~3e-9 clamps to +20), so no
    transcendental is evaluated in-plan and both engines draw the
    identical noise (the hash key uses epoch-micros integers, not
    timestamp renders — DuckDB's date_trunc('day') stringifies as a
    DATE while Spark keeps the midnight time part). One grouped count
    + per-group scalar arithmetic at any scale."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", "event_type", F.unix_micros("day").cast("string"), F.lit("dp"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    noise = F.when(h < _GEO_T60[0], _geo_noise_k(0))
    for i, t in enumerate(_GEO_T60[1:], 1):
        noise = noise.when(h < t, _geo_noise_k(i))
    noise = noise.otherwise(20)
    return g.select(
        "event_type",
        F.unix_micros("day").alias("day_us"),
        F.greatest(F.lit(0), F.col("n") + noise).cast("long").alias("noisy_n"),
    )


@register(
    "dq_psi_value_drift",
    """
WITH e AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS period,
         CAST(greatest(least(floor(value / 10), 9), 0) AS INT) AS bin
  FROM events WHERE value IS NOT NULL
),
c AS (
  SELECT event_type, bin,
         sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS nb
  FROM e GROUP BY 1, 2
),
t AS (SELECT event_type, sum(na) AS ta, sum(nb) AS tb FROM c GROUP BY 1),
q AS (
  SELECT c.event_type,
         floor(((CAST(c.nb AS DOUBLE) + 0.5) / (CAST(t.tb AS DOUBLE) + 5)
                - (CAST(c.na AS DOUBLE) + 0.5) / (CAST(t.ta AS DOUBLE) + 5))
               * ln(((CAST(c.nb AS DOUBLE) + 0.5) / (CAST(t.tb AS DOUBLE) + 5))
                    / ((CAST(c.na AS DOUBLE) + 0.5) / (CAST(t.ta AS DOUBLE) + 5)))
               * 1e12 + 0.5) AS term
  FROM c JOIN t USING (event_type)
)
SELECT q.event_type,
       CAST(t.ta AS BIGINT) AS n_a,
       CAST(t.tb AS BIGINT) AS n_b,
       floor(CAST(sum(CAST(q.term AS BIGINT)) AS DOUBLE) / 1e6 + 0.5) / 1e6 AS psi
FROM q JOIN t USING (event_type)
GROUP BY 1, 2, 3
""",
)
def dq_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the per-type value distribution
    between two time periods (before/after 2024-01-16) — THE standard
    production drift monitor for a feature/score column: 10 fixed
    [0,100) decile-width bins (clamped), Laplace-smoothed proportions
    (n+0.5)/(N+5), PSI = Σ (p_b − p_a)·ln(p_b/p_a). Rule of thumb:
    <0.1 stable, 0.1-0.25 moderate, >0.25 drifted — emitted unflagged
    so thresholds stay the caller's policy.

    Parity: proportions are exact rationals on shared integer counts;
    each bin term quantizes to an exact pico-unit int64 before the
    association-order-proof integer sum (ln carries the measure-zero
    ulp caveat, the c7b discipline). Shape: one shuffle on
    (event_type, bin) with map-side partials, a broadcast-size totals
    join, one 10-term reduce per type — a pure two-aggregate pass at
    any scale. Bins absent in one period survive via smoothing; bins
    absent in both contribute exactly 0 in either engine. Build/fold
    kernels live in operators/stats (psi_bin_counts /
    psi_from_bin_counts) and are SHARED with the streaming twin
    (streaming/ops.streaming_psi_bin_counts), so the batch monitor and
    the live monitor can never drift apart."""
    from the_framework_for_clustering_time_series_data_spark.operators.stats import psi_bin_counts, psi_from_bin_counts

    ev = load_table(spark, sf_dir, "events")
    return psi_from_bin_counts(psi_bin_counts(ev))
