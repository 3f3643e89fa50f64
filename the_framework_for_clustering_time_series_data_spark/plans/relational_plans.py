"""Relational benchmark plans over the TPC-H-ish tables — the scale
workout for the engine (bench.py headliners) and coverage for joins /
grouped aggregation / filters, which the reference only has implicitly
(SURVEY.md §2.9).

Plans are written so Catalyst produces the plan we want at 100 TB:
filters before joins (pushdown to parquet), dims broadcast, aggregates
partial-then-final on the group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


@register(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical scan→filter→agg.
    Whole-stage codegen, map-side partials, 2-key group (tiny result).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_orders",
    """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filtered fact-fact join → grouped agg → top-10.
    Filters push to both parquet scans; AQE picks the join strategy
    (shuffle join on l_orderkey — both sides large at scale).
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join. Explicit broadcast hints ONLY on the
    fixed-size dims (region: 5 rows, nation: 25 — constant at every
    scale factor); supplier/customer GROW with SF, so their join
    strategy is left to Catalyst statistics + AQE (broadcast at small
    SF, shuffle join at 100 TB — forcing broadcast would OOM there).
    The orders↔lineitem join shuffles on the natural key l_orderkey.
    """
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    r = t["region"].where(F.col("r_name") == "ASIA")
    nat = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    sup = t["supplier"].join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    cust = t["customer"]
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q6_forecast_revenue",
    """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan + 4 range predicates + global agg.
    All four predicates reach the parquet scan (PushedFilters) — the
    canonical pushdown probe; zero shuffles beyond the final single-
    partition agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q14_promo_revenue",
    """
SELECT round(
         100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
         / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct,
       count(*) AS n_rows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
  AND l.l_shipdate < TIMESTAMP '1995-10-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: fact⨝dim(part) with a month-range filter and a
    conditional aggregate (string LIKE). part GROWS with SF, so no
    forced broadcast — AQE broadcasts it at small SF and shuffle-joins
    on p_partkey at scale; lineitem's date range pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "d1_distinct_aggs",
    """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       round(sum(CASE WHEN value > 50 THEN value END), 4) AS high_value_sum
FROM events
GROUP BY event_type
""",
)
def d1_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + conditional aggregates per group (two-phase distinct
    agg: partial on (event_type, user_id), then merge — Catalyst's
    expand/aggregate rewrite handles it in two shuffles)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.when(F.col("value") > 50, F.col("value"))), 4
        ).alias("high_value_sum"),
    )


@register(
    "sj1_semi_anti_join",
    """
WITH err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
     buyers AS (
       SELECT user_id, count(*) AS n_purchases, round(sum(value), 4) AS spend
       FROM events WHERE event_type = 'purchase' GROUP BY user_id
     )
SELECT b.user_id, b.n_purchases, b.spend,
       CASE WHEN err.user_id IS NOT NULL THEN 1 ELSE 0 END AS saw_error
FROM buyers b LEFT JOIN err ON err.user_id = b.user_id
""",
)
def sj1_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join: per-buyer purchase stats + a saw-error flag.
    Spark runs the distinct error-user set as a broadcast; the flag is
    the semi/anti-join pattern expressed as a left join on a
    deduplicated key set (scales: the distinct set shrinks before the
    join, never the fact table)."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    buyers = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("spend"),
        )
    )
    err_flag = err.withColumn("saw_error", F.lit(1))
    return (
        buyers.join(F.broadcast(err_flag), "user_id", "left")
        .select(
            "user_id",
            "n_purchases",
            "spend",
            F.coalesce("saw_error", F.lit(0)).alias("saw_error"),
        )
    )


@register(
    "q18_large_orders",
    """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
       round(sum(l.l_quantity), 4) AS total_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN big ON big.l_orderkey = o.o_orderkey
GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate
ORDER BY total_qty DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: high-cardinality groupBy (every orderkey) with a
    HAVING filter feeding a semi-join back onto the fact — the
    aggregate-then-join pattern whose shuffle stays on the natural key
    l_orderkey for all three stages (one partitioning reused; AQE
    coalesces the tiny filtered side)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )
