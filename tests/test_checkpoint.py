"""Reliable-checkpoint mode (functions/plan_tools.stage_checkpoint):
every lineage-truncation site in the engine routes through one helper
that defaults to localCheckpoint (executor-local, fast) and switches to
fault-tolerant ``df.checkpoint()`` when the session opts in with
``spark.graft.checkpoint.reliable=true`` + ``sc.setCheckpointDir``.
One test per iterative loop family proves the reliable path produces
identical results AND actually writes to the checkpoint directory."""

from __future__ import annotations

import contextlib
import os
import random

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def reliable(spark, tmp_path):
    sc = spark.sparkContext
    ckdir = str(tmp_path / "ck")
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    sc.setCheckpointDir(ckdir)
    try:
        yield ckdir
    finally:
        spark.conf.set("spark.graft.checkpoint.reliable", "false")


def _tree_files(root):
    return [
        os.path.join(d, f) for d, _, fs in os.walk(root) for f in fs
    ]


def test_reliable_requires_checkpoint_dir(spark, monkeypatch):
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import stage_checkpoint

    # a sibling test may already have set a dir on the shared context;
    # shadow the probe on THIS instance so the RuntimeError contract is
    # asserted deterministically under any suite ordering (the patch
    # only affects the unset-dir branch stage_checkpoint reads)
    monkeypatch.setattr(
        spark.sparkContext, "getCheckpointDir", lambda: None
    )
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try:
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            stage_checkpoint(spark.range(5))
    finally:
        spark.conf.set("spark.graft.checkpoint.reliable", "false")


def test_rank_family_reliable_identical(spark, tmp_path):
    from the_framework_for_clustering_time_series_data_spark.operators.rank import with_global_ntiles

    rng = random.Random(3)
    df = spark.createDataFrame(
        [(i, rng.random() * 100) for i in range(1500)], "id long, v double"
    )
    spec = [("t", ["v", "id"], None)]
    base = {r["id"]: r["t"] for r in with_global_ntiles(df, 7, spec).collect()}
    with reliable(spark, tmp_path) as ck:
        rel = {r["id"]: r["t"] for r in with_global_ntiles(df, 7, spec).collect()}
        assert _tree_files(ck), "reliable mode wrote nothing to the checkpoint dir"
    assert base == rel


def test_dedup_star_loop_reliable_identical(spark, tmp_path):
    # force the distributed star-contraction loop (not the driver
    # union-find fast path) with a tiny small_graph_threshold
    from the_framework_for_clustering_time_series_data_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 120, 2)]  # 60 two-node components
        + [(j, j + 1) for j in range(200, 230)],  # one 31-node chain
        "id_a long, id_b long",
    )
    base = {
        r["node"]: r["component"]
        for r in connected_components(edges, small_graph_threshold=1).collect()
    }
    with reliable(spark, tmp_path) as ck:
        rel = {
            r["node"]: r["component"]
            for r in connected_components(edges, small_graph_threshold=1).collect()
        }
        assert _tree_files(ck)
    assert base == rel


def test_bpe_loop_reliable_identical(spark, tmp_path):
    from the_framework_for_clustering_time_series_data_spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(40)],
        "doc_id long, text string",
    )
    base = [tuple(r) for r in bpe_learn_merges(docs, n_merges=4).collect()]
    with reliable(spark, tmp_path) as ck:
        rel = [tuple(r) for r in bpe_learn_merges(docs, n_merges=4).collect()]
        assert _tree_files(ck)
    assert base == rel


def test_pam_loop_reliable_identical(spark, tmp_path):
    # the cluster-family loop (PAM assignment/update iterations)
    import random

    from the_framework_for_clustering_time_series_data_spark.operators.cluster import kmedoids

    rng = random.Random(5)
    pts = spark.createDataFrame(
        [
            (i, rng.gauss(cx, 0.4), rng.gauss(cy, 0.4))
            for i, (cx, cy) in enumerate(
                [(0, 0)] * 40 + [(5, 5)] * 40 + [(0, 5)] * 40
            )
        ],
        "series_id long, x double, y double",
    )
    base = sorted(map(tuple, kmedoids(pts, k=3, max_iter=4).collect()))
    with reliable(spark, tmp_path) as ck:
        rel = sorted(map(tuple, kmedoids(pts, k=3, max_iter=4).collect()))
        assert _tree_files(ck)
    assert base == rel
