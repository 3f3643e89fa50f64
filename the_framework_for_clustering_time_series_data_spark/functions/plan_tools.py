"""Physical-plan introspection helpers — the programmatic form of the
".explain and iterate" discipline this engine is built on (SURVEY.md
§4). `summarize_plan` turns `df.explain("formatted")` into a dict a
test or a notebook can assert on directly:

    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import summarize_plan
    s = summarize_plan(df)
    assert s["n_exchanges"] == 1 and not s["has_cartesian"]

The same properties tests/test_plans.py locks for the shipped queries,
available to users for their own compositions.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Spread a narrow scan across the cluster BEFORE a per-row-expensive
    stage (tokenization, shingling, regex scoring).

    A small table often arrives as one parquet file → one input split →
    the whole map stage runs on a single core while 31 idle; the
    self-join/groupBy that follows inherits parallelism only AFTER its
    shuffle, too late for the expensive map work. Repartitioning the raw
    rows is cheap relative to the compute they feed.

    No-op when the scan already has ≥ defaultParallelism × factor
    partitions — on a real cluster reading a 100 TB table (thousands of
    splits) this never fires; it only corrects the
    few-files-many-cores imbalance.

    Probe: the EXACT ``df.rdd.getNumPartitions()``, memoized per
    semantic plan (``df.semanticHash``). A file-count shortcut is NOT
    sound — FileSourceScan bin-packs many small files into fewer
    partitions (maxSplitBytes/openCostInBytes), and a coalesced plan
    keeps its few partitions while ``inputFiles()`` still reports many
    files — so the shortcut could silently skip the repartition this
    helper exists to apply. The memo pays the ``df.rdd`` re-planning
    cost once per distinct plan per session instead of on every call
    (stale only if the files under an identical plan change mid-session,
    which the engine's immutable-snapshot inputs rule out).

    Memo discipline (hardened round 6): ``semanticHash`` is a 32-bit
    hash, so a collision between distinct plans can serve a wrong
    count. A cached count is used ONLY as a fast-path proof of
    sufficiency (``cached >= target`` → no-op, the common case this
    memo exists for); any cached value that would trigger the
    corrective repartition is re-verified with the exact rdd probe
    first, so a collision can never cause a spurious repartition and a
    low cached count never silently skips correction. RESIDUAL RISK
    (accepted, per the round-5 advice): a collision delivering a HIGH
    count can still fast-path a genuinely narrow plan un-repartitioned
    — a ~2⁻³² perf (not correctness) event; eliminating it would mean
    paying the exact probe on every call, the cost this memo exists to
    avoid. Keys include ``defaultParallelism`` so a target-changing
    context switch never reuses a proof computed for a different
    target, and the >1024 bound evicts oldest-first instead of
    dropping the whole memo."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        key = (df.semanticHash(), sc.defaultParallelism)
    except Exception:  # pragma: no cover - plans without a semantic hash
        key = None
    if key is not None:
        cached = _NUM_PARTS_CACHE.get(key)
        if cached is not None and cached >= target:
            return df
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans without RDD conversion
        return df
    if key is not None:
        while len(_NUM_PARTS_CACHE) > 1024:  # bound the session memo
            _NUM_PARTS_CACHE.pop(next(iter(_NUM_PARTS_CACHE)))
        _NUM_PARTS_CACHE[key] = cur
    if cur < target:
        return df.repartition(target)
    return df


_NUM_PARTS_CACHE: dict[tuple[int, int], int] = {}


def lit_double_array(values):
    """A literal ``array<double>`` Column in ONE py4j round trip.

    ``F.array(*[F.lit(x) for x in vs])`` costs len(vs)+1 py4j calls —
    ~0.6 ms each (and multi-ms on a cold gateway), so a 16-centroid ×
    64-dim probe expression burned ~1000 round trips of pure driver
    time per plan BUILD (round-13 diagnosis: the sim family's bench
    cost was mostly construction, not execution — guide §7.3). Parsing
    one ``array(1.0D, …)`` SQL string JVM-side yields the IDENTICAL
    Literal array: ``repr(float)`` is the shortest round-trip decimal
    and Java's double parse is correctly rounded, so values are
    bit-identical (asserted in tests/test_plans.py)."""
    import math

    from pyspark.sql import functions as F

    parts = []
    for x in values:
        x = float(x)
        if math.isfinite(x):
            parts.append(repr(x) + "D")
        elif math.isnan(x):
            parts.append("CAST('NaN' AS DOUBLE)")
        else:
            parts.append(f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)")
    return F.expr("array(" + ",".join(parts) + ")")


def lit_long_array(values):
    """A literal ``array<bigint>`` Column in one py4j round trip — the
    integer sibling of :func:`lit_double_array` (exact by definition)."""
    from pyspark.sql import functions as F

    return F.expr("array(" + ",".join(f"{int(x)}L" for x in values) + ")")


def tiny_window(*order_cols, key: str):
    """A window over a frame KNOWN to be bounded-small — post-limit
    rank frames, md5-seed sets, fixed bucket prefixes, per-cluster
    grids. Partitions by the CONSTANT ``xxhash64(key) % 1`` (= 0 for
    every row, nulls included): semantically identical to an
    unpartitioned window — everything lands in one partition either
    way, fine by construction here — but ``WindowExec``'s
    partitionSpec stays non-empty, so driver logs stay free of the
    ``No Partition Defined`` warning and that warning remains a real
    signal for unbounded global windows. A bare ``lit(0)`` would NOT
    work: the optimizer strips foldable partition keys, which is why
    the constant must reference a column (``key`` — any always-present
    column of the frame; xxhash64 never returns null). Chain
    ``.rowsBetween`` as usual; omit ``order_cols`` for a pure
    whole-frame aggregate window (the ``Window.partitionBy()`` form)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.xxhash64(key) % F.lit(1))
    return w.orderBy(*order_cols) if order_cols else w


def exact_mean6(col, window=None):
    """Association-order-PROOF 6-dp mean of a float column: quantize
    each value to int64 MICRO-units (half-up), sum exactly, divide
    once, half-up floor back to a 6-dp quantum. Cross-engine parity
    is absolute — unlike ``round(F.avg(x), 6)``, whose float sum
    order differs between Spark partial aggregation and DuckDB (and
    between Spark runs), flipping the 6-dp round when the exact mean
    sits on a 0.5e-6 boundary. That is STRUCTURALLY common here: the
    test data's values carry ~2 decimals, so a group mean is a
    rational with denominator 100·n and lands exactly on a boundary
    with probability ≈ 1/n per group (first observed in the wild as
    the round-5 ts_decompose_dow resid flake). Null values are
    skipped like F.avg (count(col) pairs with sum-over-non-null).

    DuckDB twin::

        floor(CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS
              DOUBLE) / count(x) + 0.5) / 1e6

    Pass ``window`` to get the windowed form (both aggregates run
    over the same frame).

    OVERFLOW HEADROOM (round-6 hardening): the micro-unit sum runs in
    ``decimal(38,0)`` (the per-row quantum casts to decimal(28,0);
    Spark's sum adds 10 digits), NOT int64 — DuckDB's ``sum(BIGINT)``
    already promotes to HUGEINT (int128), so an int64 Spark sum would
    silently wrap (non-ANSI) around ~9.2e18 micro-units (~9.2e12 in
    value·rows) while the oracle kept going, breaking both the result
    and parity exactly at the scale this engine targets. Decimal(38,0)
    holds ~1e38 micro-units ≈ 1e32 in value·rows — beyond any 100-TB
    aggregate of 2-dp business values — and the final cast to double
    is identical to the oracle's ``CAST(sum AS DOUBLE)``."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    us = F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("decimal(28,0)")
    s, c = F.sum(us), F.count(col)
    if window is not None:
        s, c = s.over(window), c.over(window)
    return F.floor(s.cast("double") / c + F.lit(0.5)) / F.lit(1e6)


#: the DuckDB twin of exact_mean6 — format with the column expression
MEAN6_SQL = (
    "floor(CAST(sum(CAST(floor(({x}) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)"
    " / count({x}) + 0.5) / 1e6"
)


def stage_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Lineage-truncating materialization for iterative loops and
    multi-consumer plans — the engine's single switch between the two
    Spark checkpoint flavors:

    - default: ``localCheckpoint`` — executor-local blocks, no dir
      needed, fast. CAVEAT: blocks are UNREPLICATED and executor-bound;
      on a cluster with dynamic allocation / spot nodes, losing one
      executor makes every plan built on the checkpoint unrecoverable
      (the lineage was truncated), and the full frame must fit the
      executors' memory+disk.
    - ``spark.graft.checkpoint.reliable=true`` (session conf, opt-in):
      ``df.checkpoint()`` against the ``sc.setCheckpointDir(...)``
      directory — survives executor loss, the fleet-hardened form for
      long iterative jobs at 100 TB. Costs one distributed write per
      call.

    ``eager=True`` materializes now; ``eager=False`` defers to the
    first action but STILL truncates lineage. Either way the caller's
    plan-construction may run Spark jobs — callers that sketch
    metadata (operators/rank.py) document this eager contract.
    Use via ``df.transform(stage_checkpoint, eager=...)`` to keep
    method-chain style."""
    conf = df.sparkSession.conf
    # Plan-INSPECTION seam (tests / tools/capture_plans.py only, never
    # production): checkpoints truncate .explain() at `Scan
    # ExistingRDD`, which blinds plan-lock tests and makes
    # before/after exchange counts compare a full plan against a
    # truncated one. With this conf the frame passes through unchanged
    # so the whole kernel is visible; values are identical either way.
    if str(conf.get("spark.graft.checkpoint.disabled", "false")).lower() == "true":
        return df
    reliable = (
        str(conf.get("spark.graft.checkpoint.reliable", "false")).lower() == "true"
    )
    if reliable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise RuntimeError(
                "spark.graft.checkpoint.reliable=true requires "
                "sc.setCheckpointDir(<fault-tolerant path>) first"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize_plan(df: DataFrame) -> dict:
    """Counts of the plan features that matter at scale: shuffles
    (Exchange nodes), join strategies, scan pushdown/pruning, and
    whole-stage-codegen coverage."""
    plan = formatted_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "n_exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "n_broadcast_exchanges": len(
            re.findall(r"\(\d+\) BroadcastExchange", plan)
        ),
        "n_sorts": len(re.findall(r"\(\d+\) Sort", plan)),
        "n_scans": len(re.findall(r"\(\d+\) Scan", plan)),
        "joins": sorted(
            set(
                re.findall(
                    r"\((?:\d+)\) (BroadcastHashJoin|SortMergeJoin|"
                    r"ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
                    plan,
                )
            )
        ),
        "has_cartesian": "CartesianProduct" in plan,
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": [
            sorted(c.split(":")[0] for c in s.split(",") if c) for s in schemas
        ],
        # formatted explain tags codegen membership per node as
        # "[codegen id : N]"; under AQE these appear only once the
        # final plan has materialized (explain after an action), so an
        # empty list on a lazy frame means "not yet known", not "no
        # codegen"
        "wholestage_codegen_ids": sorted(
            set(int(x) for x in re.findall(r"codegen id : (\d+)", plan))
        ),
    }
