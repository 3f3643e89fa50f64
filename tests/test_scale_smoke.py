"""Scale smoke: the shuffle-shaped operators run on a 5M-row generated
event set (50k series) with closed-form ground truth — catches driver-
side bottlenecks (collect loops, per-key materialization) that small
fixtures hide. Data is generated distributed via spark.range; nothing
touches the driver but final scalar checks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 5_000_000
USERS = 50_000
STEP_S = 600  # one event per user every 10 min → exactly one session


@pytest.fixture(scope="module")
def big_events(spark):
    per_user = N // USERS
    df = (
        spark.range(N)
        .select(
            (F.col("id") % USERS).alias("user_id"),
            (F.col("id") / USERS).cast("long").alias("seq"),
            F.col("id").alias("event_id"),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("seq") * STEP_S
            ),
        )
        .withColumn(
            "event_type",
            F.when(F.col("seq") % 2 == 0, "click").otherwise("purchase"),
        )
        .withColumn("value", (F.col("seq") % 100).cast("double"))
    )
    yield df, per_user


def test_sessionize_5m_rows(spark, big_events):
    from the_framework_for_clustering_time_series_data_spark.operators.joins import session_stats

    df, per_user = big_events
    stats = session_stats(df, ["user_id"], gap_seconds=2 * STEP_S, seq_col="event_id")
    agg = stats.agg(
        F.count("*").alias("n_sessions"),
        F.min("n_events").alias("min_ev"),
        F.max("n_events").alias("max_ev"),
    ).first()
    # regular cadence below the gap → exactly one session per user
    assert agg["n_sessions"] == USERS
    assert agg["min_ev"] == agg["max_ev"] == per_user


def test_asof_join_5m_rows(spark, big_events):
    from the_framework_for_clustering_time_series_data_spark.operators.joins import asof_join

    df, per_user = big_events
    clicks = df.where(F.col("event_type") == "click").select(
        "user_id", "ts", "seq", "event_id"
    )
    purchases = df.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value"), "event_id"
    )
    out = asof_join(
        clicks, purchases, ["user_id"], payload_cols=["value"], seq_col="event_id"
    )
    checks = out.agg(
        F.count("*").alias("n"),
        # clicks at seq 0 have no prior purchase; all others match the
        # purchase STEP_S seconds earlier (seq-1, odd)
        F.sum(F.when(F.col("asof_ts").isNull(), 1).otherwise(0)).alias("no_match"),
        F.sum(
            F.when(
                F.col("asof_ts").isNotNull()
                & (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts") == STEP_S),
                0,
            ).otherwise(F.when(F.col("asof_ts").isNotNull(), 1).otherwise(0))
        ).alias("wrong_lag"),
    ).first()
    n_clicks = (per_user + 1) // 2 * USERS
    assert checks["n"] == n_clicks
    assert checks["no_match"] == USERS  # exactly the seq-0 clicks
    assert checks["wrong_lag"] == 0
