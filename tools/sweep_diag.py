"""Diagnostic sweep: run every registered query in sorted order (like
sweep_registry) while sampling JVM health (code-cache occupancy, GC
time, loaded classes, heap) every N queries — the tool that adjudicates
late-sweep inflation (is it query COUNT / JVM state, or data size?).

Usage: python tools/sweep_diag.py [--sf-dir DIR] [--every 20]
"""

from __future__ import annotations

import argparse
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def jvm_stats(spark) -> str:
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    parts = []
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or "Code Cache" in name or "Metaspace" in name:
            u = p.getUsage()
            parts.append(
                f"{name}={u.getUsed() // (1024 * 1024)}/"
                f"{max(u.getMax(), 0) // (1024 * 1024)}MB"
            )
    gct = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gct += it.next().getCollectionTime()
    cl = mf.getClassLoadingMXBean()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    parts.append(f"gc_ms={gct}")
    parts.append(f"classes={cl.getLoadedClassCount()}")
    parts.append(f"heap={heap.getUsed() // (1024 * 1024)}MB")
    return " ".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--every", type=int, default=20)
    args = ap.parse_args()

    from the_framework_for_clustering_time_series_data_spark.session import get_spark

    spark = get_spark("the_framework_for_clustering_time_series_data_spark-sweepdiag")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = sorted(queries)
    print(f"[start] {jvm_stats(spark)}", file=sys.stderr)
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            queries[name](spark, args.sf_dir).collect()
            dt = round(time.perf_counter() - t0, 3)
        except Exception as ex:
            dt = f"ERR:{type(ex).__name__}"
        print(f"[{i + 1}/{len(names)}] {name}: {dt}s", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        it = jmap.entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(True)
        if (i + 1) % args.every == 0:
            print(f"[jvm @{i + 1}] {jvm_stats(spark)}", file=sys.stderr)
    print(f"[end] {jvm_stats(spark)}", file=sys.stderr)
    # the canary pair, re-timed at the END of the session at sf0.1:
    for name in ("ts_gapfill_locf", "ts_interpolate_linear"):
        t0 = time.perf_counter()
        queries[name](spark, "/root/testdata/sf0.1").collect()
        print(
            f"[canary sf0.1 after sweep] {name}: "
            f"{round(time.perf_counter() - t0, 3)}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
