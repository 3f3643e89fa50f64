"""Graph centrality over relational edge lists.

The reference's lineage/traceback machinery is positional (SURVEY.md
§2.7); its only graph-adjacent computation is connectivity implied by
shared cluster membership. This module adds the standard distributed
graph primitive a training-data pipeline needs on top of that:
fixed-iteration PageRank over an edge DataFrame, expressed entirely as
joins + aggregates so Catalyst/AQE plan every step (no GraphX, no RDDs).

Scale notes (100 TB posture): the edge list is the big table. It is
shuffled ONCE onto its join key (``repartition(src)`` + cache) and every
iteration reuses that layout; per-iteration cost is one shuffle of the
(node, rank) table — orders of magnitude smaller than the edges — plus
one map-side-combined aggregate on ``dst``. Iteration count is fixed and
small (power iteration converges geometrically at damping^k), which also
keeps the plan a finite unrolled DAG the SQL oracle can mirror exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import stage_checkpoint


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
    caches_out: list | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list.

    ``r_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_k(u)/outdeg(u)``, ranks
    initialized uniformly at 1/N over the nodes that appear in any edge.
    Dangling mass is dropped (the simplified form every unrolled-SQL
    formulation uses); callers modeling undirected graphs pass the
    symmetric edge union, where no dangling nodes exist by construction.

    Returns ``(node, rank)``. N is carried as a broadcast 1-row aggregate;
    nothing is collected to the driver. The final ranks are materialized
    (localCheckpoint) so the two iteration caches can be unpersisted on
    exit instead of leaking into the session's cache for its lifetime.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one shuffle onto the iteration join key, reused by every round
    contrib = (
        e.join(deg, "src")
        .repartition("src")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n1 = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        contribs = (
            contrib.join(ranks, contrib["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("s"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    if not materialize:
        # lazy unrolled plan; the iteration caches are handed to the
        # caller via caches_out (unpersist after YOUR materialization)
        # so a composing plan pays ONE checkpoint, not two. caches_out
        # is REQUIRED here — without it the two persists would leak for
        # the session's lifetime with no handle to release them
        if caches_out is None:
            raise ValueError(
                "pagerank(materialize=False) requires caches_out: the "
                "caller owns releasing the iteration caches after its "
                "own materialization"
            )
        caches_out.extend([contrib, nodes])
        return ranks
    res = ranks.transform(stage_checkpoint, eager=True)
    contrib.unpersist()
    nodes.unpersist()
    return res
