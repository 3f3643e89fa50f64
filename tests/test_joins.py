"""Edge-case tests for the time-series join operators
(operators/joins.py): as-of tie/no-match semantics, range-join bucket
boundaries, sessionization gap boundaries.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from the_framework_for_clustering_time_series_data_spark.operators import joins

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def test_asof_backward_inclusive_and_no_match(spark):
    probe = spark.createDataFrame(
        [(1, _ts(100), "a"), (1, _ts(50), "b"), (2, _ts(10), "c")],
        "key long, ts timestamp, tag string",
    )
    build = spark.createDataFrame(
        [(1, _ts(100), 10.0, 1), (1, _ts(40), 20.0, 2), (2, _ts(11), 30.0, 3)],
        "key long, ts timestamp, value double, seq int",
    )
    out = {
        r["tag"]: r
        for r in joins.asof_join(
            probe, build, ["key"], payload_cols=["value"], seq_col="seq"
        ).collect()
    }
    # equal timestamps match (inclusive)
    assert out["a"]["asof_value"] == 10.0
    # picks the latest at-or-before, not just any
    assert out["b"]["asof_value"] == 20.0
    # build row strictly after probe → no match
    assert out["c"]["asof_value"] is None and out["c"]["asof_ts"] is None


def test_asof_tie_on_build_ts_takes_max_seq(spark):
    probe = spark.createDataFrame([(1, _ts(60), "p")], "key long, ts timestamp, tag string")
    build = spark.createDataFrame(
        [(1, _ts(50), 1.0, 1), (1, _ts(50), 2.0, 2)],
        "key long, ts timestamp, value double, seq int",
    )
    [r] = joins.asof_join(probe, build, ["key"], payload_cols=["value"], seq_col="seq").collect()
    assert r["asof_value"] == 2.0


def test_range_join_boundaries_and_bucket_spans(spark):
    # interval (start=100, end=400] with bucket_width=100 spans 4 buckets
    intervals = spark.createDataFrame(
        [(1, "iv", _ts(100), _ts(400))], "key long, iv string, start timestamp, end timestamp"
    )
    events = spark.createDataFrame(
        [(1, _ts(100), "at_start"), (1, _ts(101), "in"), (1, _ts(400), "at_end"),
         (1, _ts(401), "after"), (2, _ts(200), "wrong_key")],
        "key long, ts timestamp, tag string",
    )
    tags = sorted(
        r["tag"]
        for r in joins.range_join(events, intervals, ["key"], bucket_width=100).collect()
    )
    # start-exclusive, end-inclusive
    assert tags == ["at_end", "in"]


def test_sessionize_gap_boundary(spark):
    # gap == gap_seconds stays in-session; gap+1 starts a new one
    events = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(1800), 2), (1, _ts(3601), 3)],
        "user_id long, ts timestamp, event_id int",
    )
    out = joins.sessionize(events, ["user_id"], gap_seconds=1800, seq_col="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1}

    stats = joins.session_stats(events, ["user_id"], gap_seconds=1800, seq_col="event_id")
    rows = {r["session_id"]: r for r in stats.collect()}
    assert rows[0]["n_events"] == 2 and rows[0]["duration_s"] == 1800
    assert rows[1]["n_events"] == 1 and rows[1]["duration_s"] == 0


def test_asof_join_single_shuffle_plan(spark):
    """The as-of plan must contain no Join node — union + window only."""
    probe = spark.createDataFrame([(1, _ts(1), "x")], "key long, ts timestamp, tag string")
    build = spark.createDataFrame([(1, _ts(0), 1.0)], "key long, ts timestamp, value double")
    plan = joins.asof_join(probe, build, ["key"], payload_cols=["value"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_forward_and_nearest_semantics(spark):
    probe = spark.createDataFrame(
        [(1, _ts(100), "at"), (1, _ts(50), "mid"), (2, _ts(10), "none_b")],
        "key long, ts timestamp, tag string",
    )
    build = spark.createDataFrame(
        [(1, _ts(100), 10.0, 1), (1, _ts(40), 20.0, 2), (1, _ts(70), 30.0, 3),
         (2, _ts(11), 40.0, 4)],
        "key long, ts timestamp, value double, seq int",
    )

    fwd = {
        r["tag"]: r
        for r in joins.asof_join(
            probe, build, ["key"], payload_cols=["value"], seq_col="seq",
            direction="forward",
        ).collect()
    }
    assert fwd["at"]["asof_value"] == 10.0       # inclusive at equal ts
    assert fwd["mid"]["asof_value"] == 30.0      # earliest at-or-after 50 is 70
    assert fwd["none_b"]["asof_value"] == 40.0   # forward finds the later row

    near = {
        r["tag"]: r
        for r in joins.asof_join(
            probe, build, ["key"], payload_cols=["value"], seq_col="seq",
            direction="nearest",
        ).collect()
    }
    assert near["at"]["asof_value"] == 10.0
    # mid(50): backward at 40 (d=10), forward at 70 (d=20) → backward
    assert near["mid"]["asof_value"] == 20.0
    assert near["none_b"]["asof_value"] == 40.0  # only a forward match exists


def test_asof_nearest_tie_prefers_backward(spark):
    probe = spark.createDataFrame([(1, _ts(50), "p")], "key long, ts timestamp, tag string")
    build = spark.createDataFrame(
        [(1, _ts(40), 1.0, 1), (1, _ts(60), 2.0, 2)],
        "key long, ts timestamp, value double, seq int",
    )
    [r] = joins.asof_join(
        probe, build, ["key"], payload_cols=["value"], seq_col="seq",
        direction="nearest",
    ).collect()
    assert r["asof_value"] == 1.0
