"""Unit tests for operators/graph.py (fixed-iteration PageRank)."""

from __future__ import annotations

import pytest

from the_framework_for_clustering_time_series_data_spark.operators.graph import pagerank


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_uniform_on_regular_graph(spark):
    # 4-cycle: every node has degree 2 → PageRank stays exactly uniform
    edges = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    for v in out.values():
        assert v == pytest.approx(0.25, abs=1e-12)


def test_pagerank_path_graph_closed_form(spark):
    # path A-B-C (symmetric): hand-unrolled 3 iterations, damping 0.85
    edges = _sym(spark, [(0, 1), (1, 2)])
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    r = {n: 1 / 3 for n in (0, 1, 2)}
    for _ in range(3):
        r = {
            0: 0.15 / 3 + 0.85 * r[1] / 2,
            1: 0.15 / 3 + 0.85 * (r[0] + r[2]),
            2: 0.15 / 3 + 0.85 * r[1] / 2,
        }
    for n in (0, 1, 2):
        assert out[n] == pytest.approx(r[n], abs=1e-12)
    # probability mass is conserved on a graph with no dangling nodes
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_degree_one_hub(spark):
    # star: hub 0 connected to 1..4 — hub must outrank every leaf, and
    # all leaves tie by symmetry
    edges = _sym(spark, [(0, i) for i in range(1, 5)])
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    leaves = [out[i] for i in range(1, 5)]
    assert out[0] > max(leaves)
    assert max(leaves) == pytest.approx(min(leaves), abs=1e-12)


def test_two_phase_components_path_graph_log_rounds(spark):
    """Adversarial chain-shaped graph (containment chains a⊂b⊂c⊂…):
    the two-phase star contraction must (a) agree exactly with
    union-find and (b) converge in O(log n) rounds — min-label
    propagation would need O(n) rounds on a 10k-node path."""
    import math

    from the_framework_for_clustering_time_series_data_spark.operators import dedup

    n = 10_000
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    stats: dict = {}
    out = dedup.connected_components(df, small_graph_threshold=0, stats=stats)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 3, stats


def test_two_phase_components_match_union_find_random(spark):
    """Distributed path ≡ driver union-find fast path on the same
    random multi-component graph (threshold crossed both ways)."""
    import random

    from the_framework_for_clustering_time_series_data_spark.operators import dedup

    rng = random.Random(42)
    edges = list(
        {
            (a, b)
            for a, b in (
                (rng.randint(0, 800), rng.randint(0, 800)) for _ in range(600)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    dist = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df, small_graph_threshold=0).collect()
    }
    fast = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            df, small_graph_threshold=10**9
        ).collect()
    }
    assert dist == fast and len(dist) > 0
