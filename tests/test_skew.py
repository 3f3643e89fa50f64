"""Salted aggregation / join equivalence tests (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from the_framework_for_clustering_time_series_data_spark.operators import skew


def test_salted_sum_count_matches_plain_agg(spark):
    # heavily skewed: 90% of rows share one key
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i%10}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (round(r["v_sum"], 6), r["v_count"])
        for r in skew.salted_sum_count(df, ["k"], "v", n_salt=7).collect()
    }
    want = {
        r["k"]: (round(r["s"], 6), r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("c")).collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark):
    facts = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, x long",
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2), ("absent", 3)], "k string, tag int")
    got = sorted(map(tuple, skew.salted_join(facts, dim, "k", n_salt=4).select("k", "x", "tag").collect()))
    want = sorted(map(tuple, facts.join(dim, "k").select("k", "x", "tag").collect()))
    assert got == want
