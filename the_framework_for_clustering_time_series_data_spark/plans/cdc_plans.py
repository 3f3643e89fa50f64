"""Change-data-capture plans: the changelog→dimension surface a lakehouse
pipeline runs on every ingest cycle (Debezium/Delta-CDF shape) —
SCD Type-2 history build with no-op compaction, MERGE-semantics apply
(upsert + delete tombstones), and point-in-time snapshot reconstruction.

The ``events`` table plays the changelog: per user, each 'purchase'
event is a state transition (state = value bucket); 'error' events are
delete tombstones in the CDC feed. All three plans are pure window/join
compositions — shuffle once on the key, every window bounded per key,
MERGE as one full-outer join against the deduplicated change batch
(full outer cannot broadcast — the scale story is a key-bucketed base,
the standard MERGE-target layout, which makes the base exchange free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

#: Shared oracle CTE: the compacted SCD2 interval table. Changelog =
#: purchase events per user ordered by (ts, event_id); state = value
#: bucket (width 50); consecutive equal states collapse (CDC no-op
#: compaction) so each surviving row opens a new validity interval.
_SCD2_CTES = """
chg AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value / 50) AS INT) AS tier
  FROM events WHERE event_type = 'purchase'
),
mark AS (
  SELECT user_id, ts, event_id, tier,
         lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
  FROM chg
),
compact AS (
  SELECT user_id, ts, event_id, tier FROM mark
  WHERE prev_tier IS NULL OR tier <> prev_tier
),
scd2 AS (
  SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
         tier,
         ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM compact
)
"""


def scd2_compact_build(chg: DataFrame) -> DataFrame:
    """Core SCD2 build over a changelog ``(user_id, ts, event_id,
    tier)``: no-op compaction then validity intervals — shared by the
    registered plans and the 5M-row scale smoke."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    compact = (
        chg.withColumn("prev_tier", F.lag("tier").over(w))
        .where(F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier")))
        .select("user_id", "ts", "event_id", "tier")
    )
    # event_id tiebreak MUST survive into the interval windows too:
    # two surviving transitions can share a ts, and a ts-only order
    # would make version/valid_to nondeterministic (and diverge from
    # the streaming twin's (ts, event_id) replay order)
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return compact.select(
        "user_id",
        F.row_number().over(w2).cast("int").alias("version"),
        "tier",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


def _scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    chg = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") / 50).cast("int").alias("tier"),
    )
    return scd2_compact_build(chg)


@register(
    "cdc_scd2_compact",
    f"""
WITH {_SCD2_CTES}
SELECT user_id, version, tier, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM scd2
""",
)
def cdc_scd2_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a changelog, WITH no-op
    compaction: per user the purchase stream is bucketed into states,
    consecutive duplicate states are dropped (the compaction step real
    CDC appliers run so a 100 TB changelog of mostly-idle keys doesn't
    bloat the dimension), and each surviving transition opens a
    validity interval closed by the next one (lead). Both windows
    partition on user_id with compatible sort orders, so Catalyst
    plans ONE exchange reused across them — per-key window state is
    bounded and the build streams at any scale."""
    iv = _scd2_intervals(spark, sf_dir)
    return iv.withColumn("is_current", F.col("valid_to").isNull())


@register(
    "cdc_merge_apply",
    """
WITH feed AS (
  SELECT user_id * 11 + 3 AS key, ts, event_id,
         event_type = 'error' AS is_delete,
         round(value * 10, 2) AS new_bal
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-25' AND event_type IN ('purchase', 'error')
),
latest AS (
  SELECT key, is_delete, new_bal FROM (
    SELECT *, row_number() OVER (PARTITION BY key ORDER BY ts DESC, event_id DESC) AS rn
    FROM feed
  ) WHERE rn = 1
),
merged AS (
  SELECT coalesce(c.c_custkey, l.key) AS custkey,
         coalesce(c.c_name, 'Customer#new#' || CAST(l.key AS VARCHAR)) AS name,
         round(coalesce(l.new_bal, c.c_acctbal), 6) AS acctbal,
         CASE WHEN l.key IS NULL THEN 'kept'
              WHEN c.c_custkey IS NULL THEN 'inserted'
              ELSE 'updated' END AS action,
         coalesce(l.is_delete, FALSE) AS is_delete
  FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.key
)
SELECT custkey, name, acctbal, action FROM merged
WHERE NOT is_delete
""",
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-semantics CDC apply (the Delta/Iceberg MERGE INTO shape,
    composed from primitives): the last-6-days feed keyed to the
    customer dimension (key = user_id*11+3 so every branch is
    exercised), deduplicated to latest-op-per-key FIRST (row_number —
    without this a multi-row source makes MERGE nondeterministic),
    then ONE full-outer join applies it: matched+tombstone deletes,
    matched updates, not-matched inserts, untouched rows kept. Full
    outer cannot broadcast, so the base shuffles once on its key; at
    fleet scale a base bucketed on the key makes that exchange free
    (the standard lakehouse layout for MERGE targets), and the deduped
    batch side is tiny either way."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    feed = ev.where(
        (F.col("ts") >= F.lit("2024-01-25").cast("timestamp"))
        & F.col("event_type").isin("purchase", "error")
    ).select(
        (F.col("user_id") * 11 + 3).alias("key"),
        "ts",
        "event_id",
        (F.col("event_type") == "error").alias("is_delete"),
        F.round(F.col("value") * 10, 2).alias("new_bal"),
    )
    w = Window.partitionBy("key").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        feed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", "is_delete", "new_bal")
    )
    merged = cust.join(
        latest, cust["c_custkey"] == latest["key"], "full_outer"
    ).select(
        F.coalesce("c_custkey", "key").alias("custkey"),
        F.coalesce(
            "c_name", F.concat(F.lit("Customer#new#"), F.col("key").cast("string"))
        ).alias("name"),
        F.round(F.coalesce("new_bal", "c_acctbal"), 6).alias("acctbal"),
        F.when(F.col("key").isNull(), "kept")
        .when(F.col("c_custkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("action"),
        F.coalesce("is_delete", F.lit(False)).alias("is_delete"),
    )
    return merged.where(~F.col("is_delete")).drop("is_delete")


@register(
    "cdc_snapshot_asof",
    f"""
WITH {_SCD2_CTES}
SELECT user_id, version, tier, valid_from
FROM scd2
WHERE valid_from <= TIMESTAMP '2024-01-15'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15')
""",
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot from the SCD2 history: the state of every
    key as of 2024-01-15 — the interval covering T (half-open
    [valid_from, valid_to)). This is the time-travel read an auditing
    or training-reproducibility pipeline issues against the dimension;
    on a valid_from-partitioned history the predicate prunes to the
    covering partitions."""
    iv = _scd2_intervals(spark, sf_dir)
    t = F.lit("2024-01-15").cast("timestamp")
    return iv.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", "version", "tier", "valid_from")


@register(
    "cdc_dimension_lookup",
    f"""
WITH {_SCD2_CTES},
f AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
SELECT f.event_id, f.user_id,
       coalesce(s.version, -1) AS version,
       coalesce(s.tier, -1) AS tier
FROM f LEFT JOIN scd2 s
  ON s.user_id = f.user_id AND s.valid_from <= f.ts
 AND (s.valid_to IS NULL OR f.ts < s.valid_to)
""",
)
def cdc_dimension_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event SCD2 version lookup — the temporal dimension enrich a
    warehouse fact pipeline runs on every batch: each 'view' event
    joins the dimension version valid AT ITS OWN event time
    (half-open [valid_from, valid_to); views before the user's first
    transition get version/tier −1). Completes the CDC read surface
    next to cdc_snapshot_asof (ONE time for ALL keys) with the
    per-row-time form (one time PER FACT row).

    Shape: an EQUI join on user_id with the interval predicate as a
    post-join filter — SortMergeJoin on the key, never a range
    cartesian; intervals per key are disjoint and partition the
    timeline, so at most one version survives per fact. At 100 TB the
    dimension side is the compacted SCD2 table (small vs facts) and
    broadcasts; the fact side never reshuffles more than once."""
    iv = _scd2_intervals(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    f = ev.where(F.col("event_type") == "view").select(
        "event_id", F.col("user_id").alias("f_uid"), "ts"
    )
    j = f.join(
        iv,
        (F.col("f_uid") == iv["user_id"])
        & (iv["valid_from"] <= F.col("ts"))
        & (iv["valid_to"].isNull() | (F.col("ts") < iv["valid_to"])),
        "left",
    )
    return j.select(
        "event_id",
        F.col("f_uid").alias("user_id"),
        F.coalesce(F.col("version"), F.lit(-1)).alias("version"),
        F.coalesce(F.col("tier"), F.lit(-1)).alias("tier"),
    )
