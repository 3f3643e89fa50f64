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
