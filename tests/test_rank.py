"""Exact distributed ntile (operators/rank.py): bit-equivalence with
the flat ``ntile() OVER (ORDER BY ...)`` window across row counts,
tile counts, tie patterns, and bucket counts — plus the plan property
(no unpartitioned window over the input) that is the operator's reason
to exist."""

from __future__ import annotations

import contextlib
import io
import random
import re

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_ntiles


def _flat(df, n, order_cols):
    return {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(n).over(Window.orderBy(*order_cols))
        ).collect()
    }


def _dist(df, n, order_cols, **kw):
    out = with_global_ntiles(df, n, [("t", order_cols, None)], **kw)
    return {r["id"]: r["t"] for r in out.collect()}


def test_matches_flat_ntile_continuous_and_tied(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.choice([rng.random() * 100, float(rng.randint(0, 4))]))
        for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    for n in (2, 5, 7):
        assert _flat(df, n, ["v", "id"]) == _dist(df, n, ["v", "id"])


def test_matches_flat_ntile_small_and_degenerate(spark):
    # N < n (each row its own tile), N == 1, all-equal leading key
    for rows in ([(i, 1.0) for i in range(3)], [(0, 5.0)],
                 [(i, 7.0) for i in range(40)]):
        df = spark.createDataFrame(rows, "id long, v double")
        for n in (4, 5):
            assert _flat(df, n, ["v", "id"]) == _dist(df, n, ["v", "id"])


def test_matches_flat_ntile_few_buckets(spark):
    rng = random.Random(3)
    df = spark.createDataFrame(
        [(i, rng.random()) for i in range(500)], "id long, v double"
    )
    for buckets in (2, 3, 16):
        assert _flat(df, 5, ["v", "id"]) == _dist(
            df, 5, ["v", "id"], buckets=buckets
        )


def test_multi_spec_single_pass(spark):
    rng = random.Random(5)
    rows = [
        (i, rng.random(), float(rng.randint(0, 30))) for i in range(700)
    ]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    exact = {
        r["id"]: (r["ta"], r["tb"])
        for r in df.select(
            "id",
            F.ntile(4).over(Window.orderBy("a", "id")).alias("ta"),
            F.ntile(4).over(Window.orderBy("b", "id")).alias("tb"),
        ).collect()
    }
    out = with_global_ntiles(
        df, 4, [("ta", ["a", "id"], None), ("tb", ["b", "id"], None)]
    )
    mine = {r["id"]: (r["ta"], r["tb"]) for r in out.collect()}
    assert exact == mine


def test_no_unpartitioned_window_over_input(spark):
    """The scale property: every Window in the plan is partitioned, and
    every SinglePartition exchange feeds only the one-row
    percentile_approx sketch aggregate — never a sort of the input."""
    rng = random.Random(1)
    df = spark.createDataFrame(
        [(i, rng.random()) for i in range(200)], "id long, v double"
    )
    out = with_global_ntiles(df, 5, [("t", ["v", "id"], None)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert not re.search(r"\bntile\(", plan)
    # an unpartitioned window's spec STARTS with an ordering expression
    # ("col ASC NULLS FIRST, ..."), a partitioned one with a plain
    # partition attribute — so no spec may lead with a sort direction
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        head = spec.split(",")[0]
        assert " ASC" not in head and " DESC" not in head, (
            f"unpartitioned window: {spec[:80]}"
        )


def test_global_cumsum_matches_flat_window(spark):
    import random

    from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_cumsum

    rng = random.Random(9)
    df = spark.createDataFrame(
        [(i, rng.randint(1, 5000)) for i in range(2500)], "id long, w long"
    )
    flat = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.orderBy(F.desc("w"), "id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    mine = {
        r["id"]: r["cum"]
        for r in with_global_cumsum(
            df, [F.desc("w"), F.col("id")], F.col("w"), "cum", -F.col("w")
        ).collect()
    }
    assert flat == mine


def test_empty_input(spark):
    """Zero-row input: the metadata jobs yield empty boundary/offset
    literals (a zero-entry create_map) and the plan still builds and
    returns zero rows for both rank forms."""
    from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_cumsum

    df = spark.createDataFrame([], "id long, v double")
    assert with_global_ntiles(df, 4, [("t", ["v", "id"], None)]).count() == 0
    assert (
        with_global_cumsum(
            df, [F.col("v"), F.col("id")], F.lit(1).cast("long"), "c", F.col("v")
        ).count()
        == 0
    )


def test_global_cumsum_decimal_weights(spark):
    """Decimal weight columns must keep fractional bucket offsets:
    offset literals follow SUM's Catalyst output type (decimal), not a
    long cast that silently truncates. Compared against the flat
    single-partition window, which Spark types identically."""
    from decimal import Decimal

    from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_cumsum

    rows = [(i, Decimal(f"{(i * 7) % 50}.{(i * 13) % 100:02d}")) for i in range(800)]
    df = spark.createDataFrame(rows, "id long, w decimal(10,2)")
    flat = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.orderBy(F.desc("w"), "id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    mine = {
        r["id"]: r["cum"]
        for r in with_global_cumsum(
            df,
            [F.desc("w"), F.col("id")],
            F.col("w"),
            "cum",
            -F.col("w").cast("double"),
        ).collect()
    }
    assert flat == mine
