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


def test_minhash_lsh_200k_docs(spark):
    """MinHash-LSH at 200k generated docs where every doc has exactly
    one planted near-duplicate (its pair differs by one appended
    token): the pipeline must recover >=95% of the planted pairs and
    nothing across pair boundaries. Exercises the explode -> window ->
    65-aggregate signature stage and the banding bucket join at a
    scale where an O(n^2) or driver-side path would blow up."""
    from the_framework_for_clustering_time_series_data_spark.operators import dedup

    n_pairs = 100_000
    # doc i and doc i + n_pairs share a 20-token body; the copy appends
    # one token, so Jaccard on 3-gram shingles ~= 18/21 ~= 0.857
    base = spark.range(2 * n_pairs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n_pairs).alias("pair"),
        (F.col("id") >= n_pairs).cast("int").alias("is_copy"),
    )
    body = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"w{j}_"), F.conv(F.col("pair") * 31 + j, 10, 16)) for j in range(20)],
    )
    docs = base.select(
        "doc_id",
        F.when(F.col("is_copy") == 1, F.concat(body, F.lit(" extratoken"))).otherwise(body).alias("text"),
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5, n=3)
    ok = pairs.where(F.col("id_b") - F.col("id_a") == n_pairs).count()
    cross = pairs.where(F.col("id_b") - F.col("id_a") != n_pairs).count()
    assert ok >= 0.95 * n_pairs, f"recovered {ok}/{n_pairs} planted pairs"
    assert cross == 0, f"{cross} spurious cross-pair matches"
