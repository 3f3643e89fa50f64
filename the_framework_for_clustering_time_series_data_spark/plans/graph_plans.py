"""Graph-centrality plans over the relational tables.

``graph_pagerank_purchases`` runs fixed-iteration PageRank
(operators/graph.py) on the symmetric customer↔part purchase graph
derived from ``orders ⨝ lineitem``. The reference has no graph
operator; this is the standard importance measure a curation pipeline
uses to weight items by structural centrality rather than raw counts
(a part bought once by each of many well-connected customers outranks
one bought many times by a single customer).

Because the iteration count is fixed (3) the whole computation is a
finite DAG, so the DuckDB oracle mirrors it exactly as unrolled CTEs —
same uniform init, same left-join + coalesce dangling handling, same
damping — making this one of the few iterative-algorithm entries with
a full value-hash oracle rather than a rows-only check.

Scale notes (100 TB posture): the edge list (2×|distinct (cust,part)|)
is shuffled once onto ``src`` and cached; each iteration shuffles only
the (node, rank) table, which is |customers|+|parts| — dimension-sized,
not fact-sized. The final rank normalization multiplies by N carried as
a broadcast 1-row aggregate, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from the_framework_for_clustering_time_series_data_spark.operators.graph import pagerank

from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import stage_checkpoint, tiny_window
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

# part node ids live above this offset so one BIGINT id space holds both
# sides of the bipartite graph without collision at any scale factor
_PART_OFFSET = 1_000_000_000_000
_ITER = 3
_DAMPING = 0.85


@register(
    "graph_pagerank_purchases",
    f"""
WITH base AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c AS src, p + {_PART_OFFSET} AS dst FROM base
  UNION ALL
  SELECT p + {_PART_OFFSET} AS src, c AS dst FROM base
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
s1 AS (SELECT e.dst AS node, sum(r.pr / d.outdeg) AS s
       FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r1 AS (SELECT nodes.node, {1 - _DAMPING} / nn.n + {_DAMPING} * coalesce(s1.s, 0) AS pr
       FROM nodes CROSS JOIN nn LEFT JOIN s1 ON s1.node = nodes.node),
s2 AS (SELECT e.dst AS node, sum(r.pr / d.outdeg) AS s
       FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r2 AS (SELECT nodes.node, {1 - _DAMPING} / nn.n + {_DAMPING} * coalesce(s2.s, 0) AS pr
       FROM nodes CROSS JOIN nn LEFT JOIN s2 ON s2.node = nodes.node),
s3 AS (SELECT e.dst AS node, sum(r.pr / d.outdeg) AS s
       FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r3 AS (SELECT nodes.node, {1 - _DAMPING} / nn.n + {_DAMPING} * coalesce(s3.s, 0) AS pr
       FROM nodes CROSS JOIN nn LEFT JOIN s3 ON s3.node = nodes.node),
buyers AS (SELECT p, count(*) AS n_buyers FROM base GROUP BY p)
SELECT r3.node - {_PART_OFFSET} AS partkey,
       buyers.n_buyers,
       round(r3.pr * nn.n, 6) AS rank_norm
FROM r3 CROSS JOIN nn
JOIN buyers ON buyers.p = r3.node - {_PART_OFFSET}
WHERE r3.node >= {_PART_OFFSET}
""",
)
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-side PageRank over the symmetric customer↔part purchase
    graph, 3 power iterations, damping 0.85, reported as ``rank_norm``
    (rank × N, so 1.0 = the uniform-graph value) alongside the raw
    distinct-buyer count the rank refines.

    Shape: one distinct on (custkey, partkey) builds the bipartite edge
    set; the symmetric union doubles it; pagerank() shuffles edges once
    onto ``src`` and iterates with dimension-sized rank shuffles; the
    part-side projection joins the buyer-count aggregate (same ``base``
    subtree, reused) and the broadcast node count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    edges = base.select(
        F.col("c").alias("src"), (F.col("p") + _PART_OFFSET).alias("dst")
    ).union(
        base.select(
            (F.col("p") + _PART_OFFSET).alias("src"), F.col("c").alias("dst")
        )
    )
    # lazy form + cache handoff: this plan materializes ONCE at its own
    # final checkpoint below instead of paying a second one inside
    # pagerank
    _pr_caches: list = []
    ranks = pagerank(
        edges, iterations=_ITER, damping=_DAMPING,
        materialize=False, caches_out=_pr_caches,
    )
    nn = base.agg(
        (F.countDistinct("c") + F.countDistinct("p")).alias("n")
    )
    buyers = base.groupBy(F.col("p").alias("partkey")).agg(
        F.count("*").alias("n_buyers")
    )
    res = (
        ranks.where(F.col("node") >= _PART_OFFSET)
        .select((F.col("node") - _PART_OFFSET).alias("partkey"), "rank")
        .join(buyers, "partkey")
        .crossJoin(F.broadcast(nn))
        .select(
            "partkey",
            "n_buyers",
            F.round(F.col("rank") * F.col("n"), 6).alias("rank_norm"),
        )
        # materialize (part-dimension-sized) so the shared `base`
        # subtree cache and pagerank's iteration caches can be
        # released instead of leaking
        .transform(stage_checkpoint, eager=True)
    )
    base.unpersist()
    for c in _pr_caches:
        c.unpersist()
    return res


@register(
    "graph_triangle_count",
    """
WITH co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT a.l_orderkey) >= 2
),
tri AS (
  SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
  FROM co e1
  JOIN co e2 ON e2.pa = e1.pb
  JOIN co e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
pern AS (
  SELECT part, count(*) AS n_triangles FROM (
    SELECT x AS part FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY part
),
rk AS (
  SELECT part, n_triangles,
         row_number() OVER (ORDER BY n_triangles DESC, part) AS rn
  FROM pern
)
SELECT part, n_triangles, CAST(rn AS INT) AS rank
FROM rk WHERE rn <= 20
""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the part co-purchase graph (edges =
    part pairs co-occurring in ≥2 orders, the q23 support convention):
    per-part triangle participation, top-20 — the local-clustering
    signal behind community/complementary-product detection.

    Shape: the canonical ordered-wedge plan (node ids totally ordered,
    edges stored (lo, hi)) — each triangle x<y<z is found exactly once
    by joining wedge (x,y)+(y,z) against closing edge (x,z): two
    equi-joins on edge endpoints, no direction double-count, wedge
    fan-out bounded by the co-purchase support threshold. Top-k is
    TakeOrdered with post-limit rank."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count_distinct(F.col("a.l_orderkey")).alias("_s"))
        .where(F.col("_s") >= 2)
        .select("pa", "pb")
    )
    e1 = co.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = co.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    e3 = co.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    pern = (
        tri.select(F.col("x").alias("part"))
        .unionAll(tri.select(F.col("y").alias("part")))
        .unionAll(tri.select(F.col("z").alias("part")))
        .groupBy("part")
        .agg(F.count("*").alias("n_triangles"))
    )
    top = pern.orderBy(F.desc("n_triangles"), "part").limit(20)
    w = tiny_window(F.desc("n_triangles"), "part", key="part")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "part", "n_triangles", "rank"
    )


def _hits_round_sql(r: int, h_prev: str, a_prev: str) -> str:
    """One unrolled HITS round in exact integers: hub score = sum of
    neighbor authorities, authority = sum of updated neighbor hubs,
    each max-normalized to micro-units by integer floor division
    (operands nonnegative, so DuckDB's truncating ``//`` IS floor)."""
    return f"""hr{r} AS (
  SELECT e.c, sum(a.a_us) AS raw FROM e JOIN {a_prev} a USING (s) GROUP BY 1
),
h{r} AS (
  SELECT c, (raw * 1000000) // (SELECT max(raw) FROM hr{r}) AS h_us FROM hr{r}
),
ar{r} AS (
  SELECT e.s, sum(h.h_us) AS raw FROM e JOIN h{r} h USING (c) GROUP BY 1
),
a{r} AS (
  SELECT s, (raw * 1000000) // (SELECT max(raw) FROM ar{r}) AS a_us FROM ar{r}
)"""


@register(
    "graph_hits_authority",
    f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a0 AS (SELECT DISTINCT s, CAST(1000000 AS BIGINT) AS a_us FROM e),
{_hits_round_sql(1, "h0", "a0")},
{_hits_round_sql(2, "h1", "a1")}
SELECT s AS s_suppkey,
       CAST(a_us AS DOUBLE) / 1000000.0 AS authority,
       CAST(row_number() OVER (ORDER BY a_us DESC, s) AS INT) AS rnk
FROM a2
""",
)
def graph_hits_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM'99) on the bipartite
    customer→supplier purchase graph — the authority side ranks
    suppliers by how much well-connected customers buy from them, the
    structural-quality weighting next to graph_pagerank_purchases. Two
    fixed rounds fully unrolled (like the PageRank oracle), all
    arithmetic exact integers: scores live in micro-units and each
    round max-normalizes by integer floor division (nonnegative, so
    both engines' integer division agree). Edge list is
    |distinct (cust, supp)| — each round shuffles only node-sized
    score tables, never the fact table. Output: every supplier's
    final authority + deterministic (authority DESC, key) rank."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        # round 12 (guide §2.4): the edge list feeds both half-rounds
        # of every iteration, and each round's score table feeds both
        # its own max-aggregate and the next join — unchecked, the
        # unrolled two-round DAG re-instantiated every upstream subtree
        # per consumer (122 Exchange nodes in the pre-r12 plan; 9 now).
        # Edge + per-round score frames are node-sized; values exact.
        .transform(stage_checkpoint, eager=False)
    )
    a = e.select("s").distinct().withColumn("a_us", F.lit(1000000).cast("long"))
    for _ in range(2):
        hr = (
            e.join(a, "s")
            .groupBy("c")
            .agg(F.sum("a_us").alias("raw"))
            .transform(stage_checkpoint, eager=False)
        )
        hmax = hr.agg(F.max("raw").alias("mx"))
        h = hr.crossJoin(F.broadcast(hmax)).select(
            "c", F.expr("(raw * 1000000) div mx").alias("h_us")
        )
        ar = (
            e.join(h, "c")
            .groupBy("s")
            .agg(F.sum("h_us").alias("raw"))
            .transform(stage_checkpoint, eager=False)
        )
        amax = ar.agg(F.max("raw").alias("mx"))
        a = ar.crossJoin(F.broadcast(amax)).select(
            "s", F.expr("(raw * 1000000) div mx").alias("a_us")
        )
    return a.select(
        F.col("s").alias("s_suppkey"),
        (F.col("a_us").cast("double") / 1000000.0).alias("authority"),
        F.row_number()
        .over(Window.orderBy(F.col("a_us").desc(), "s"))
        .cast("int")
        .alias("rnk"),
    )
