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
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_cumsum, with_global_ntiles
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import tiny_window
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
        # selective dim first: ASIA suppliers keep ~1/5 of lines, so the
        # orders and customer shuffles move 5× fewer rows (Catalyst has
        # no CBO stats here to reorder this itself)
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
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


@register(
    "q4_priority_exists",
    """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: EXISTS with a correlated
    date condition (line shipped >60 days after ordering — the
    schema's stand-in for commit/receipt lateness), expressed as a
    LEFT SEMI join so each order is emitted at most once regardless of
    how many late lines it has. The semi join shuffles on the natural
    key l_orderkey; the order-date range pushes to the orders scan."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q7_nation_volume",
    """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bilateral shipping volume: the fact joins BOTH a
    supplier-side and a customer-side nation dimension (aliased copies
    of the same 25-row table, both broadcast), with the two-country
    disjunction applied after both lookups and the ship-date range
    pushed to the lineitem scan."""
    t = {n: load_table(spark, sf_dir, n) for n in ("supplier", "lineitem", "orders", "customer", "nation")}
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    joined = (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


@register(
    "q8_market_share",
    """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 6) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: one nation's fraction of regional
    revenue per year — a conditional-sum ratio over a 7-table join.
    Customer-side nation⨝region restricts the market; the supplier-side
    nation labels the numerator. Fixed-size dims broadcast; part is
    filtered to one type before the fact join so AQE can broadcast the
    survivors at small SF."""
    t = {n: load_table(spark, sf_dir, n) for n in ("part", "lineitem", "supplier", "orders", "customer", "nation", "region")}
    part = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    asia = t["region"].where(F.col("r_name") == "ASIA")
    cust_nat = t["nation"].join(F.broadcast(asia), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("cn_key")
    )
    supp_nat = t["nation"].select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    joined = (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cust_nat), F.col("cn_key") == F.col("c_nationkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(supp_nat), F.col("sn_key") == F.col("s_nationkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_profit_by_nation",
    """
SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
""",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product profit by nation and year. The schema has
    no partsupp, so supply cost is modeled as half the part's retail
    price — the plan shape (substring part filter → 5-table join →
    two-key agg) is the point. The p_name LIKE filter cannot push to
    parquet as a range, but column pruning + AQE broadcast of the
    filtered part side keep the fact scan dominant."""
    t = {n: load_table(spark, sf_dir, n) for n in ("part", "lineitem", "supplier", "orders", "nation")}
    part = t["part"].where(F.col("p_name").like("%widget%")).select("p_partkey", "p_retailprice")
    nat = t["nation"].select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("sn_key") == F.col("s_nationkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: top-20 customers by lost
    revenue in a quarter. Both selective predicates (order-date range,
    returnflag) push to their scans before the 4-way join; the final
    ordered LIMIT is a TakeOrdered physical op — no full sort."""
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "nation")}
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    nat = t["nation"].select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q13_order_distribution",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER
    join with an extra non-equi condition (priority exclusion lives in
    the JOIN, not WHERE — customers with only urgent orders must still
    appear with count 0), then a two-level aggregation. count(o_orderkey)
    counts non-null matches only, preserving the zero bucket."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q16_supplier_diversity",
    """
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45' AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 25)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
""",
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier diversity per (brand, type, size), with
    lineitem standing in for partsupp and negative-balance suppliers
    standing in for the complaints exclusion. The NOT IN becomes a
    LEFT ANTI join (safe: s_suppkey is never null); the IN-list and
    brand/type predicates push to the part scan; count(DISTINCT) runs
    as Catalyst's two-phase expand aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 25))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@register(
    "q17_small_qty_revenue",
    """
SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly, count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: a correlated scalar avg
    subquery per part, decorrelated into a per-part aggregate joined
    back on l_partkey — the aggregate side shrinks to one row per part
    and broadcasts; the fact is scanned once (the subquery side scans
    only the two needed columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select("p_partkey")
    part_avg = (
        li.groupBy(F.col("l_partkey").alias("pa_key"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_cap"))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("pa_key") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive predicates: an OR of three
    brand/size/quantity conjunctions spanning both join sides. Catalyst
    extracts the common single-side implications (brand IN (...),
    size <= 15, quantity ranges) and pushes them below the join, so
    neither scan reads rows that no disjunct can accept."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q22_lapsed_customers",
    """
SELECT c.c_mktsegment AS segment, count(*) AS numcust,
       round(sum(c.c_acctbal), 4) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT floor(CAST(sum(CAST(floor(c_acctbal * 1e6 + 0.5)
                                            AS BIGINT)) AS DOUBLE)
                                  / count(c_acctbal) + 0.5) / 1e6
                     FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
""",
)
def q22_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: high-balance customers with no recent orders
    (the schema has no phone country codes, so market segment is the
    report key and "no orders since 2000" is the lapse test). The
    scalar avg subquery becomes a broadcast cross join of a 1-row
    aggregate; NOT EXISTS becomes a LEFT ANTI join against the
    date-filtered orders — both sides shrink before touching
    customer. The threshold is the exact micro-unit mean
    (plan_tools.exact_mean6): balances carry 2 decimals, so a
    customer sitting exactly on the float mean would let reduction
    order decide the filter (the ts_decompose_dow flake class)."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import exact_mean6

    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        exact_mean6(F.col("c_acctbal")).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         sum(l_extendedprice) / sum(l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), ranked AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_cost, l_suppkey) AS rk
  FROM cost
)
SELECT p.p_partkey, s.s_name, n.n_name AS nation,
       round(r.unit_cost, 4) AS unit_cost, round(s.s_acctbal, 4) AS s_acctbal
FROM ranked r
JOIN part p ON p.p_partkey = r.l_partkey
JOIN supplier s ON s.s_suppkey = r.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE r.rk = 1 AND p.p_size <= 15 AND p.p_type = 'ECONOMY'
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (schema has no partsupp, so
    effective unit cost = sum(price)/sum(qty) per (part, supplier) from
    lineitem). The correlated MIN subquery of the original becomes a
    rank-1 window pick over a pre-aggregated (part, supplier) rollup —
    one shuffle for the agg, the rank reuses the same partitioning on
    l_partkey, and the three dimension joins broadcast."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = cost.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    return (
        best.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("unit_cost", 4).alias("unit_cost"),
            F.round("s_acctbal", 4).alias("s_acctbal"),
        )
    )


@register(
    "q11_important_parts",
    """
WITH v AS (
  SELECT l.l_partkey,
         sum(CAST(floor(l.l_extendedprice * l.l_quantity * 1e6 + 0.5)
                  AS BIGINT)) / 1e6 AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l.l_partkey
)
SELECT l_partkey AS partkey, round(value, 4) AS value
FROM v
WHERE value > (SELECT 1.5 * (floor(CAST(sum(CAST(floor(value * 1e6 + 0.5)
                                            AS BIGINT)) AS DOUBLE)
                                   / count(value) + 0.5) / 1e6)
               FROM v)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock: per-part value restricted to
    two nations' suppliers, kept only above 1.5x the mean per-part value (scalar subquery;
    an average-based cut stays non-degenerate at every scale factor). The per-part rollup is computed once,
    cached, and the 1-row grand total broadcasts back onto it — no
    second scan of the fact table for the threshold.

    PARITY DISCIPLINE: both comparison sides are exact — each
    extendedprice×quantity product rounds to int64 micro-units
    (recovering the exact 2-dp rational the float product sits within
    an ulp of) and sums exactly; the threshold is 1.5× the exact
    micro-unit mean (×1.5 is exact in binary). A part sitting exactly
    on the float threshold would otherwise let reduction order decide
    the filter (the ts_decompose_dow flake class)."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import exact_mean6

    li = load_table(spark, sf_dir, "lineitem")
    supp_keys = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(
                    F.col("n_name").isin("NATION_3", "NATION_7")
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey")
    )
    # decimal(28,0) per-row quantum → decimal(38,0) sum: DuckDB's
    # sum(BIGINT) is HUGEINT, so an int64 Spark sum would wrap first
    # (~sf 20 for this filtered-revenue aggregate) while the oracle
    # kept going — 128-bit both sides keeps the exact-micro-unit
    # discipline scale-safe (see plan_tools.exact_mean6).
    prod_us = F.floor(
        F.col("l_extendedprice") * F.col("l_quantity") * F.lit(1e6) + F.lit(0.5)
    ).cast("decimal(28,0)")
    v = (
        li.join(F.broadcast(supp_keys), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg((F.sum(prod_us) / F.lit(1e6)).alias("value"))
    )
    total = v.agg((1.5 * exact_mean6(F.col("value"))).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), F.round("value", 4).alias("value"))
    )


@register(
    "q12_ship_latency",
    """
SELECT o.o_orderpriority,
       CAST(sum(CASE WHEN l.l_shipdate >  o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
       CAST(sum(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < TIMESTAMP '2001-01-01'
GROUP BY o.o_orderpriority
""",
)
def q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style shipping-mode report (the schema has no
    l_shipmode/commitdate, so the split is late-vs-ontime against a
    60-day order-to-ship latency). The two counts are conditional sums
    inside ONE aggregate over one join — not two scans — and the date
    filter pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp")
    )
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_count"),
        )
    )


@register(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 4) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: quarter revenue per supplier, keep
    the max (ties preserved, per the spec's view semantics). The
    scalar MAX subquery is a 1-row broadcast joined back onto the same
    aggregated revenue — the fact table is scanned once."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue"))
    )


@register(
    "q20_part_suppliers",
    """
SELECT s.s_name, round(s.s_acctbal, 4) AS s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_4', 'NATION_5')
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type = 'ECONOMY'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 50
  )
""",
)
def q20_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style qualified suppliers: the nested
    part-filter → grouped HAVING → IN chain becomes a distinct-key
    LEFT SEMI join. The inner aggregate groups on (suppkey, partkey),
    so qualification is per part-supplier pair exactly as in the
    original's availqty test; nation filter broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    qualified = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_4", "NATION_5")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(qualified, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 4).alias("s_acctbal"))
    )


@register(
    "q21_blamed_suppliers",
    """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q21_blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style sole-blame suppliers (late = shipped >90 days
    after the order date; the schema has no receipt/commit dates).
    The EXISTS + NOT-EXISTS pair decorrelates into ONE per-order
    aggregate — distinct supplier count and distinct LATE supplier
    count — joined back to the late lines: a line qualifies iff its
    order has >=2 suppliers and exactly 1 late supplier (necessarily
    this line's). Two shuffles on l_orderkey total, instead of the
    original's two correlated re-scans."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    # two-level aggregate instead of countDistinct×2: the distinct pair
    # rollup combines map-side, avoiding the Expand (2× row) plan that
    # multi-distinct aggregation generates over the full joined fact.
    # The late-LINE count folds into the same aggregate, so the fact is
    # scanned once and never joined back: the per-order qualifier is a
    # window over the (order, supplier) rollup — orders of magnitude
    # smaller than the fact at any scale.
    # ONE exchange for both stages: hash partitioning on l_orderkey
    # satisfies the (l_orderkey, l_suppkey) aggregate's clustering AND
    # the per-order window's, so the explicit repartition replaces the
    # agg's (ok, sk) exchange and the window's ok re-exchange that the
    # default plan pays back to back (3 → 2 exchanges measured).
    lines = lines.repartition("l_orderkey")
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("supp_late"),
        F.sum(F.col("is_late").cast("long")).alias("n_late_lines"),
    )
    wo = Window.partitionBy("l_orderkey")
    qualified = per_supp.select(
        "l_suppkey",
        "supp_late",
        "n_late_lines",
        F.count("*").over(wo).alias("n_supp"),
        F.sum("supp_late").over(wo).alias("n_late_supp"),
    ).where(
        (F.col("supp_late") == 1)
        & (F.col("n_supp") >= 2)
        & (F.col("n_late_supp") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        qualified.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "sj2_full_outer_daily",
    """
WITH rev AS (
  SELECT cast(date_trunc('day', l_shipdate) AS TIMESTAMP) AS d,
         round(sum(l_extendedprice), 4) AS revenue
  FROM lineitem GROUP BY 1
),
ev AS (
  SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS d, count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT coalesce(rev.d, ev.d) AS day,
       coalesce(revenue, 0) AS revenue,
       coalesce(n_events, 0) AS n_events,
       (rev.d IS NULL) AS only_events, (ev.d IS NULL) AS only_revenue
FROM rev FULL OUTER JOIN ev ON rev.d = ev.d
""",
)
def sj2_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two independently-aggregated
    calendars (lineitem revenue days vs event days) — the snapshot-diff
    plan shape: both sides pre-aggregate to one row per day BEFORE the
    join, so the full-outer shuffle moves day-cardinality rows, not
    facts; coalesce + null flags classify each day as matched or
    one-sided."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    rev = li.groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("d_rev")).agg(
        F.round(F.sum("l_extendedprice"), 4).alias("revenue")
    )
    evd = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d_ev")).agg(
        F.count("*").alias("n_events")
    )
    return rev.join(evd, F.col("d_rev") == F.col("d_ev"), "full_outer").select(
        F.coalesce("d_rev", "d_ev").alias("day"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("d_rev").isNull().alias("only_events"),
        F.col("d_ev").isNull().alias("only_revenue"),
    )


@register(
    "r3_pivot_event_types",
    """
SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY 1
""",
)
def r3_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide PIVOT: daily event counts, one column per event type.
    The value list is EXPLICIT — with it, pivot is a single grouped
    aggregate of conditional counts (one pass, map-side partials);
    without it Spark must first collect the distinct values to the
    driver (an extra job and a scan) before it can even plan."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


@register(
    "r4_unpivot_value_stats",
    """
WITH s AS (
  SELECT event_type,
         round(min(value), 6) AS v_min,
         round(avg(value), 6) AS v_avg,
         round(max(value), 6) AS v_max
  FROM events GROUP BY 1
)
SELECT event_type, 'v_min' AS stat, v_min AS value FROM s
UNION ALL SELECT event_type, 'v_avg', v_avg FROM s
UNION ALL SELECT event_type, 'v_max', v_max FROM s
""",
)
def r4_unpivot_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt): per-type value stats flattened to
    (event_type, stat, value) rows via the native ``unpivot`` operator
    — an Expand node, one pass over the aggregated input, no union of
    re-scans (the UNION ALL in the oracle re-reads the CTE; Spark's
    Expand emits all three rows per input row in place)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.avg("value"), 6).alias("v_avg"),
        F.round(F.max("value"), 6).alias("v_max"),
    )
    return s.unpivot("event_type", ["v_min", "v_avg", "v_max"], "stat", "value")


@register(
    "a7_histogram",
    """
WITH b AS (
  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem
),
h AS (
  SELECT least(floor((l_extendedprice - mn) / ((mx - mn) / 32)), 31)::INT AS bucket,
         l_extendedprice AS v, mn, mx
  FROM lineitem, b
)
SELECT bucket,
       round(mn + bucket * ((mx - mn) / 32), 6) AS bucket_lo,
       count(*) AS n,
       round(sum(v), 4) AS sum_v
FROM h
GROUP BY bucket, mn, mx
""",
)
def a7_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bin equi-width histogram of l_extendedprice with data-derived
    bounds: tiny min/max aggregate broadcast back over the scan, then
    one partial-then-final aggregate on the bucket id. Bucketing uses
    explicit ``floor((v-mn)/w)`` arithmetic (identical IEEE double ops
    on both engines) rather than engine-specific width_bucket edge
    rules. At 100 TB both passes are full scans but the exchange
    carries only 32 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_extendedprice").alias("v"))
    bounds = li.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    w = (F.col("mx") - F.col("mn")) / F.lit(32)
    return (
        li.join(F.broadcast(bounds))
        .select(
            F.least(F.floor((F.col("v") - F.col("mn")) / w), F.lit(31))
            .cast("int")
            .alias("bucket"),
            "v",
            "mn",
            "mx",
        )
        .groupBy("bucket", "mn", "mx")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 4).alias("sum_v"))
        .select(
            "bucket",
            F.round(F.col("mn") + F.col("bucket") * w, 6).alias("bucket_lo"),
            "n",
            "sum_v",
        )
    )


@register(
    "q23_market_basket",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
s AS (SELECT l_partkey, count(*) AS n_p FROM b GROUP BY l_partkey),
p AS (
  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b, count(*) AS n_ab
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND y.l_partkey > x.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
)
SELECT p.part_a, p.part_b, p.n_ab, sa.n_p AS n_a, sb.n_p AS n_b,
       round(p.n_ab * 1.0 / n.n_orders, 6) AS support,
       round(p.n_ab * 1.0 / sa.n_p, 6) AS confidence_a_b,
       round(p.n_ab * 1.0 * n.n_orders / (sa.n_p * sb.n_p), 6) AS lift
FROM p
JOIN s sa ON sa.l_partkey = p.part_a
JOIN s sb ON sb.l_partkey = p.part_b
CROSS JOIN n
""",
)
def q23_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase mining: frequent part PAIRS (min
    co-count 3) with support, directional confidence, and lift — the
    association-rule query (the 2-itemset core of FPGrowth, which at
    pair level is exactly this self-join + aggregate and needs no tree
    structure). Lift > 1 flags genuinely associated parts vs
    popularity coincidence.

    Shape: the basket table distincts once and self-joins on the order
    key — each order's quadratic pair fan-out is local to its hash
    partition and bounded by basket size (≤7 lines/order in this
    schema); the HAVING prunes before the two dimension joins; the
    1-row order count broadcasts. At fleet scale, giant baskets cap
    like MinHash buckets (drop or sample baskets past a size bound —
    their pairs are noise for association mining anyway)."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    s = b.groupBy("l_partkey").agg(F.count("*").alias("n_p"))
    x = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    y = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    p = (
        x.join(y, "ok")
        .where(F.col("part_b") > F.col("part_a"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    return (
        p.join(s.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a")), "part_a")
        .join(s.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b")), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") * F.lit(1.0) / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_ab") * F.lit(1.0) / F.col("n_a"), 6).alias("confidence_a_b"),
            F.round(
                F.col("n_ab") * F.lit(1.0) * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "q24_yoy_nation_growth",
    """
WITH r AS (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
         sum(o.o_totalprice) AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
g AS (
  SELECT nation, yr, revenue,
         lag(revenue) OVER (PARTITION BY nation ORDER BY yr) AS prev
  FROM r
)
SELECT nation, yr, round(revenue, 4) AS revenue,
       round((revenue - prev) / prev, 6) AS yoy_growth
FROM g WHERE prev IS NOT NULL
""",
)
def q24_yoy_nation_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the trend twin of
    q5's point-in-time regional revenue: yearly aggregate, then a
    per-nation lag window for the growth ratio (first year drops —
    no prior to compare). The customer/nation dims broadcast; the
    yearly aggregate is map-side-partial; the growth window runs on
    nations × years, a dimension-sized frame."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").alias("yr")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    r = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("nation", "yr")
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    g = r.withColumn("prev", F.lag("revenue").over(w))
    return g.where(F.col("prev").isNotNull()).select(
        "nation",
        "yr",
        F.round("revenue", 4).alias("revenue"),
        F.round((F.col("revenue") - F.col("prev")) / F.col("prev"), 6).alias(
            "yoy_growth"
        ),
    )


@register(
    "q25_rfm_segments",
    """
WITH m AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         round(sum(o_totalprice), 4) AS monetary
  FROM orders GROUP BY o_custkey
),
q AS (
  SELECT custkey, last_order, frequency, monetary,
         ntile(5) OVER (ORDER BY last_order, custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency, custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary, custkey) AS m_score
  FROM m
)
SELECT custkey, frequency, monetary, r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 4 THEN 'recent'
            WHEN f_score >= 4 THEN 'loyal'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM q
""",
)
def q25_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (last order date), frequency
    (order count), monetary (total spend) quintiled with ntile and
    mapped to the classic champion/recent/loyal/at_risk/regular
    segments — the canonical marketing-analytics derivation. Every
    ntile carries a custkey tie-break so quintile boundaries are a
    total order and the segmentation is deterministic cross-engine.

    Shape: one per-customer aggregate, then three EXACT distributed
    ntiles via operators/rank.with_global_ntiles — sketch-derived range
    buckets broadcast back, per-bucket parallel rank, closed-form tile
    from the exact global rank. Bit-identical to the flat
    ``ntile() OVER`` the oracle states, but the per-customer table
    (10⁸+ rows at 100 TB) never crosses an unpartitioned
    single-partition window: the only global sorts left are over the
    ≤64-row bucket-count tables."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 4).alias("monetary"),
    )
    q = with_global_ntiles(
        m,
        5,
        [
            # day-granular proxy: non-strict monotone is fine (intra-day
            # ties share a bucket; the full key order refines inside it)
            (
                "r_score",
                ["last_order", "custkey"],
                F.datediff(F.col("last_order"), F.lit("1970-01-01")),
            ),
            ("f_score", ["frequency", "custkey"], None),
            ("m_score", ["monetary", "custkey"], None),
        ],
    ).select("custkey", "frequency", "monetary", "r_score", "f_score", "m_score")
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "loyal")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "at_risk")
        .otherwise("regular")
    )
    return q.withColumn("segment", seg)


@register(
    "q26_shipping_sla",
    """
WITH d AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT priority, count(*) AS n_lines,
       round(quantile_cont(delay_days, 0.5), 6) AS p50_delay,
       round(quantile_cont(delay_days, 0.9), 6) AS p90_delay,
       round(avg(CASE WHEN delay_days > 90 THEN 1.0 ELSE 0.0 END), 6)
         AS late_rate
FROM d GROUP BY priority
""",
)
def q26_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-SLA audit per order priority: exact p50/p90
    order-to-ship delay in days and the >90-day late rate — the
    operational-latency rollup every fulfillment dashboard carries,
    over the orders⨝lineitem join. Exact percentiles use the
    continuous-interpolation convention a5_percentiles pinned (Spark
    ``percentile`` ≡ DuckDB quantile_cont); the 100 TB path swaps in
    percentile_approx with the same plan shape. Day-diff arithmetic
    is exact integer on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay_days"),
    )
    return d.groupBy("priority").agg(
        F.count("*").alias("n_lines"),
        F.round(F.expr("percentile(delay_days, 0.5)"), 6).alias("p50_delay"),
        F.round(F.expr("percentile(delay_days, 0.9)"), 6).alias("p90_delay"),
        F.round(
            F.avg(F.when(F.col("delay_days") > 90, 1.0).otherwise(0.0)), 6
        ).alias("late_rate"),
    )


@register(
    "q27_brand_supplier_hhi",
    """
WITH r AS (
  SELECT p.p_brand AS brand, l.l_suppkey AS suppkey,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
t AS (
  SELECT brand, revenue, suppkey,
         sum(revenue) OVER (PARTITION BY brand) AS brand_total,
         count(*) OVER (PARTITION BY brand) AS n_suppliers
  FROM r
)
SELECT brand, any_value(n_suppliers) AS n_suppliers,
       round(any_value(brand_total), 4) AS brand_revenue,
       round(sum(pow(revenue / brand_total, 2)), 6) AS hhi,
       round(max(revenue / brand_total), 6) AS top_share
FROM t GROUP BY brand
""",
)
def q27_brand_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration audit per part brand: the
    Herfindahl–Hirschman index (Σ share², the antitrust-standard
    concentration measure — 1/n_suppliers = perfectly even, 1.0 =
    monopoly) plus the top supplier's share, over discounted revenue.
    The supply-chain-risk rollup a procurement pipeline gates on.

    Shape: part dim broadcasts into the (brand, supplier) revenue
    aggregate; the share normalization is a brand-partition window
    over the supplier-dimension-sized rollup; the final aggregate
    returns one row per brand. Shares divide before squaring, so the
    HHI is scale-free and the cross-engine comparison sees identical
    ratios of identically-aggregated doubles at 6 dp."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    r = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("brand")
    t = r.withColumn("brand_total", F.sum("revenue").over(w)).withColumn(
        "n_suppliers", F.count("*").over(w)
    )
    share = F.col("revenue") / F.col("brand_total")
    return t.groupBy("brand").agg(
        F.any_value("n_suppliers").alias("n_suppliers"),
        F.round(F.any_value("brand_total"), 4).alias("brand_revenue"),
        F.round(F.sum(F.pow(share, 2)), 6).alias("hhi"),
        F.round(F.max(share), 6).alias("top_share"),
    )


@register(
    "q28_basket_size_profile",
    """
WITH b AS (
  SELECT l_orderkey, count(*) AS n_lines,
         count(DISTINCT l_partkey) AS n_parts
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines, count(*) AS n_orders,
       round(avg(n_parts), 6) AS avg_distinct_parts,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS frac_orders
FROM b GROUP BY n_lines
""",
)
def q28_basket_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: orders per line count with the mean
    distinct-part count and share of all orders — the profiling stat
    that bounds q23_market_basket's per-order quadratic pair fan-out
    (max basket size caps the self-join cost) and calibrates basket
    -capping thresholds. Two stacked aggregates; the grand total for
    the share is a 1-row window over the ≤10-row line-count grid."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    c = b.groupBy("n_lines").agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("n_parts"), 6).alias("avg_distinct_parts"),
    )
    w = tiny_window(key="n_lines")
    return c.select(
        "n_lines",
        "n_orders",
        "avg_distinct_parts",
        F.round(F.col("n_orders") * F.lit(1.0) / F.sum("n_orders").over(w), 6).alias(
            "frac_orders"
        ),
    )


@register(
    "q29_revenue_pareto",
    """
WITH m AS (
  SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY 1
),
c AS (
  SELECT custkey, spend, CAST(round(spend * 100) AS BIGINT) AS cents FROM m
),
w AS (
  SELECT *, sum(cents) OVER (ORDER BY spend DESC, custkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM c
),
t AS (SELECT sum(cents) AS tot FROM c)
SELECT custkey, spend,
       round(cum * 1.0 / tot, 6) AS cum_share,
       (cum - cents) * 10 < tot * 8 AS is_top80
FROM w, t
""",
)
def q29_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration analysis: customers ranked by spend, each
    carrying its cumulative revenue share and a flag for the head set
    covering 80% of revenue — the 80/20 dashboard cut.

    Scale shape: the running sum over the spend-DESC total order is
    the same unpartitioned-window trap q25 had; it runs through
    rank.with_global_cumsum (sketch range buckets + per-bucket windows
    + exact offsets) so the per-customer table never crosses an
    Exchange SinglePartition. Spend quantizes to BIGINT cents before
    any sum — both engines accumulate exact integers, and the 80%
    membership test is pure integer arithmetic ((cum-cents)·10 <
    tot·8), immune to float association."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    base = m.withColumn("cents", F.round(F.col("spend") * 100).cast("long"))
    cum = with_global_cumsum(
        base,
        [F.desc("spend"), F.col("custkey")],
        F.col("cents"),
        "cum",
        -F.col("spend"),
    )
    tot = base.agg(F.sum("cents").alias("tot"))
    return cum.crossJoin(F.broadcast(tot)).select(
        "custkey",
        "spend",
        F.round(F.col("cum") * 1.0 / F.col("tot"), 6).alias("cum_share"),
        ((F.col("cum") - F.col("cents")) * 10 < F.col("tot") * 8).alias("is_top80"),
    )


@register(
    "dq_expectations",
    """
WITH li AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
  FROM lineitem
),
fk AS (
  SELECT count(*) AS v FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
),
oo AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT o_orderkey) AS v_uniq,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
  FROM orders
)
SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
FROM (
  SELECT 'l_quantity_in_1_50' AS rule, li.n AS n_checked, li.v_qty AS n_violations FROM li
  UNION ALL SELECT 'l_extendedprice_nonneg', li.n, li.v_price FROM li
  UNION ALL SELECT 'l_discount_in_0_0.1', li.n, li.v_disc FROM li
  UNION ALL SELECT 'l_orderkey_fk_orders', (SELECT n FROM li), fk.v FROM fk
  UNION ALL SELECT 'o_orderkey_unique', oo.n, oo.v_uniq FROM oo
  UNION ALL SELECT 'o_totalprice_positive', oo.n, oo.v_price FROM oo
)
""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the Deequ/Great-
    Expectations check suite as ONE query): range, non-negativity,
    referential-integrity, and uniqueness rules over lineitem/orders,
    each reporting checked/violation counts and a pass flag — the
    admission gate a pipeline runs before trusting a new snapshot.

    Shape: all lineitem range rules fuse into ONE scan's aggregate
    (conditional sums), orders rules into another; the FK rule is a
    broadcast-able anti-join count. Constant-size output; at 100 TB
    each rule family still costs one map-side-combined scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    one = F.lit(1)
    zero = F.lit(0)
    li_agg = li.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), one).otherwise(zero)
        ).alias("v_qty"),
        F.sum(F.when(F.col("l_extendedprice") < 0, one).otherwise(zero)).alias("v_price"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), one).otherwise(zero)
        ).alias("v_disc"),
    )
    fk_v = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("v"))
    )
    o_agg = o.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("v_uniq"),
        F.sum(F.when(F.col("o_totalprice") <= 0, one).otherwise(zero)).alias("v_price"),
    )

    def rule(name: str, src: DataFrame, n_col, v_col) -> DataFrame:
        return src.select(
            F.lit(name).alias("rule"),
            n_col.alias("n_checked"),
            v_col.alias("n_violations"),
        )

    li_n = li_agg.select("n")
    rules = (
        rule("l_quantity_in_1_50", li_agg, F.col("n"), F.col("v_qty"))
        .unionByName(rule("l_extendedprice_nonneg", li_agg, F.col("n"), F.col("v_price")))
        .unionByName(rule("l_discount_in_0_0.1", li_agg, F.col("n"), F.col("v_disc")))
        .unionByName(
            rule("l_orderkey_fk_orders", fk_v.crossJoin(F.broadcast(li_n)), F.col("n"), F.col("v"))
        )
        .unionByName(rule("o_orderkey_unique", o_agg, F.col("n"), F.col("v_uniq")))
        .unionByName(rule("o_totalprice_positive", o_agg, F.col("n"), F.col("v_price")))
    )
    return rules.withColumn("pass", F.col("n_violations") == 0)


@register(
    "layout_zorder_pruning",
    """
WITH b AS (
  SELECT event_id, user_id, value,
         ntile(64) OVER (ORDER BY user_id, event_id) - 1 AS bu,
         ntile(64) OVER (ORDER BY value, event_id) - 1 AS bv
  FROM events
),
z AS (
  SELECT user_id, value,
         (  (((bu >> 0) & 1) << 1)  | (((bv >> 0) & 1) << 0)
          | (((bu >> 1) & 1) << 3)  | (((bv >> 1) & 1) << 2)
          | (((bu >> 2) & 1) << 5)  | (((bv >> 2) & 1) << 4)
          | (((bu >> 3) & 1) << 7)  | (((bv >> 3) & 1) << 6)
          | (((bu >> 4) & 1) << 9)  | (((bv >> 4) & 1) << 8)
          | (((bu >> 5) & 1) << 11) | (((bv >> 5) & 1) << 10)) // 256 AS file_id
  FROM b
)
SELECT CAST(file_id AS INT) AS file_id, count(*) AS n_rows,
       min(user_id) AS u_min, max(user_id) AS u_max,
       round(min(value), 6) AS v_min, round(max(value), 6) AS v_max
FROM z GROUP BY 1
""",
)
def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: the registry-visible twin of
    sources/writers.write_zordered. Rows are ranked into 64 exact
    equi-depth buckets per dimension (user_id and value,
    event_id-tie-broken), the bucket ids bit-interleave into a Morton
    code, and the code's top bits assign one of 16 output "files";
    the per-file min/max column statistics this emits are exactly what
    parquet footer pruning sees after such a write — every file narrow
    in BOTH dimensions at once, which a lexicographic sort only gives
    the leading key.

    Scale shape: bucketing is operators/rank.with_global_ntiles (one
    percentile-sketch aggregate broadcast back, per-range-bucket
    windows — never a single-partition sort over the fact table;
    same machinery as q25), the interleave is pure JVM-side integer
    bit arithmetic, and the audit aggregate is one map-side-combined
    groupBy on 16 keys. The oracle states the flat ntile form of the
    same layout. write_zordered itself uses approxQuantile boundaries
    (cheaper, rank-approximate) — equivalent layout, not bit-equal,
    which is why the audit query pins the exact-ntile form."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    b = with_global_ntiles(
        ev,
        64,
        [
            ("bu", ["user_id", "event_id"], None),
            ("bv", ["value", "event_id"], None),
        ],
    ).select(
        "user_id",
        "value",
        (F.col("bu") - 1).alias("bu"),
        (F.col("bv") - 1).alias("bv"),
    )
    z = F.lit(0)
    for i in range(6):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright("bu", i).bitwiseAND(F.lit(1)), 2 * i + 1))
            .bitwiseOR(F.shiftleft(F.shiftright("bv", i).bitwiseAND(F.lit(1)), 2 * i))
        )
    files = b.withColumn("file_id", (z / 256).cast("int"))
    return files.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"),
    )


def _hilbert_round_sql(k: int, s: int) -> str:
    """One level of the standard Hilbert xy->d transform (Wikipedia's
    loop, unrolled): quadrant digit into d, reflect+swap into the next
    level's frame. Pure integer CASE/bit arithmetic — bit-identical in
    any engine."""
    p = k - 1
    return f"""h{k} AS (
  SELECT user_id, value,
         d + {s * s} * (xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                            (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END))) AS d,
         CASE WHEN (y & {s}) = 0
              THEN (CASE WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN (y & {s}) = 0
              THEN (CASE WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END)
              ELSE y END AS y
  FROM h{p}
)"""


_HILBERT_ROUNDS = ",\n".join(
    _hilbert_round_sql(k, 1 << (6 - k)) for k in range(1, 7)
)


@register(
    "layout_hilbert_pruning",
    f"""
WITH b AS (
  SELECT event_id, user_id, value,
         ntile(64) OVER (ORDER BY user_id, event_id) - 1 AS bu,
         ntile(64) OVER (ORDER BY value, event_id) - 1 AS bv
  FROM events
),
h0 AS (SELECT user_id, value, 0 AS d, bu AS x, bv AS y FROM b),
{_HILBERT_ROUNDS}
SELECT CAST(d // 128 AS INT) AS file_id, count(*) AS n_rows,
       min(user_id) AS u_min, max(user_id) AS u_max,
       round(min(value), 6) AS v_min, round(max(value), 6) AS v_max
FROM h6 GROUP BY 1
""",
)
def layout_hilbert_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout audit — the liquid-clustering counterpart
    of layout_zorder_pruning (Databricks' successor to Z-order uses a
    Hilbert walk precisely because it has no Morton diagonal jumps, so
    per-file bounding boxes are tighter). Same harness as the Z-order
    audit: 64 exact equi-depth buckets per dimension (with_global_ntiles
    — never a single-partition fact sort), then the standard Hilbert
    xy→d transform UNROLLED over the 6 bit-levels (quadrant digit +
    reflect/swap per level — pure JVM integer CASE/bit arithmetic, no
    UDF), top bits of d → 32 files, per-file min/max column stats = the
    parquet-footer pruning view. 32 files (128-cell curve segments) is
    the deliberate choice: at power-of-4 segment sizes both curves
    degenerate to identical quadrant files, while at 128 cells a
    Morton segment spans a diagonal jump and a Hilbert segment is two
    ADJACENT sub-quadrants — tests/test_plans.py asserts the Hilbert
    layout's total bounding-box area is strictly tighter at this
    granularity. The oracle replays the same 6 unrolled levels as
    chained CTEs; d is integer-exact in both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    b = with_global_ntiles(
        ev,
        64,
        [
            ("bu", ["user_id", "event_id"], None),
            ("bv", ["value", "event_id"], None),
        ],
    ).select(
        "user_id",
        "value",
        (F.col("bu") - 1).alias("x"),
        (F.col("bv") - 1).alias("y"),
    )
    d = F.lit(0)
    x, y = F.col("x"), F.col("y")
    for k in range(1, 7):
        s = 1 << (6 - k)
        rx = F.when((x.bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        ry = F.when((y.bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        d = d + F.lit(s * s) * ((rx * 3).bitwiseXOR(ry))
        nx = F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)).otherwise(x)
        ny = F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)).otherwise(y)
        x, y = nx, ny
    files = b.withColumn("file_id", F.floor(d / 128).cast("int"))
    return files.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"),
    )


@register(
    "layout_compaction_pruning",
    """
WITH b AS (
  SELECT user_id, event_id,
         ntile(16) OVER (ORDER BY user_id, event_id) - 1 AS file_id
  FROM events
)
SELECT CAST(file_id AS INT) AS file_id, count(*) AS n_rows,
       min(user_id) AS u_min, max(user_id) AS u_max
FROM b GROUP BY 1
""",
)
def layout_compaction_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving compaction layout audit — the registry-visible
    twin of sources/writers.compact_parquet_preserve_order (round-7
    layout-maintenance op): rows bin-pack into 16 equi-depth files
    along the cluster key (user_id, event_id-tie-broken), and the
    per-file min/max stats this emits are the parquet-footer view after
    such a rewrite — files are DISJOINT, contiguous key ranges, so a
    range predicate on the cluster key skips the same files it skipped
    before compaction (round-robin compact_parquet erases exactly this;
    the physical property is asserted on real written files in
    tests/test_writers.py).

    Scale shape: bucketing is operators/rank.with_global_ntiles (one
    percentile-sketch aggregate broadcast back — never a
    single-partition fact sort; the exact-ntile stand-in for
    repartitionByRange's sampled ranges), and the audit aggregate is a
    map-side-combined groupBy on 16 keys."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    b = with_global_ntiles(
        ev, 16, [("file_id", ["user_id", "event_id"], None)]
    ).select("user_id", (F.col("file_id") - 1).cast("int").alias("file_id"))
    return b.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
    )


@register(
    "q30_skyline_parts",
    """
WITH g AS (
  SELECT p_retailprice AS price, max(p_size) AS gmax
  FROM part GROUP BY 1
),
w AS (
  SELECT price, gmax,
         max(gmax) OVER (ORDER BY price
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM g
),
sky AS (
  SELECT price, gmax FROM w
  WHERE prevmax IS NULL OR gmax > prevmax
)
SELECT p.p_partkey, round(p.p_retailprice, 6) AS price, p.p_size AS size
FROM part p JOIN sky s
  ON p.p_retailprice = s.price AND p.p_size = s.gmax
""",
)
def q30_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query (Borzsony et al., ICDE'01) —
    the preference operator the TPC-H set lacks: parts not dominated
    on (minimize retailprice, maximize size). NOT the naive O(n²)
    dominance self-join: 2-D skyline reduces to one grouped max per
    price + one running-max window over the DISTINCT price table — a
    point survives iff it carries its price group's max size AND that
    size strictly exceeds every cheaper group's max (equal (price,
    size) duplicates all survive; neither dominates the other). The
    window runs over |distinct prices| rows, the verdict joins back
    to the fact — O(n log n) with dimension-sized window state, the
    form that still works when `part` is 100 TB."""
    p = load_table(spark, sf_dir, "part")
    g = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("gmax")
    )
    # bounded by the price DOMAIN (2-dp currency values), not the
    # corpus — the tiny_window contract; a corpus-cardinality frontier
    # dimension would need the with_global_ntiles range-partitioned form
    w = tiny_window("price", key="price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        g.withColumn("prevmax", F.max("gmax").over(w))
        .where(F.col("prevmax").isNull() | (F.col("gmax") > F.col("prevmax")))
        .select("price", "gmax")
    )
    return p.join(
        F.broadcast(sky),
        (p["p_retailprice"] == sky["price"]) & (p["p_size"] == sky["gmax"]),
    ).select(
        "p_partkey",
        F.round("p_retailprice", 6).alias("price"),
        F.col("p_size").alias("size"),
    )
