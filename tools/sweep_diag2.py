"""Diagnostic 2: inject a canary (ts_gapfill_locf @ sf0.1) every N
queries of an sf0.001 sweep, splitting DataFrame build / physical
planning / execution time — locates WHERE late-session inflation goes
and when it sets in."""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def canary(spark, queries) -> None:
    t0 = time.perf_counter()
    df = queries["ts_gapfill_locf"](spark, "/root/testdata/sf0.1")
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    df._jdf.queryExecution().executedPlan()
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.count()
    t_exec = time.perf_counter() - t0
    print(
        f"[canary] build={t_build:.2f}s plan={t_plan:.2f}s exec={t_exec:.2f}s",
        file=sys.stderr,
    )


def main() -> None:
    from the_framework_for_clustering_time_series_data_spark.session import get_spark

    spark = get_spark("the_framework_for_clustering_time_series_data_spark-sweepdiag2")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = sorted(queries)
    canary(spark, queries)
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            queries[name](spark, "/root/testdata/sf0.001").collect()
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
        if (i + 1) % 40 == 0:
            canary(spark, queries)
    canary(spark, queries)


if __name__ == "__main__":
    main()
