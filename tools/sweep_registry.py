"""Full-registry perf sweep: time EVERY registered query once at a
given sf dir (default sf0.1), one pass per query with cache clears so
each plan pays its own codegen — the whole-surface perf record the
48-query curated bench headline cannot give (BASELINE.md sweep
sections).

Writes one JSON object to SWEEP.json (never BENCH_FULL.json — that
file is the bench CLI's and gets overwritten by any bench run) and
prints a compact summary: total, errors, 15 slowest.

Usage: python tools/sweep_registry.py [--sf-dir DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="SWEEP.json")
    args = ap.parse_args()

    # Use the SAME session factory as bench.py — a hand-rolled builder
    # here left spark.driver.memory at the 1 GiB default, and across
    # ~260 queries in one local-mode JVM the resulting GC pressure
    # inflated window-heavy queries 30-100x (ts_interpolate_linear
    # 38.6 s in-sweep vs 0.3 s isolated under get_spark's 8g heap).
    from the_framework_for_clustering_time_series_data_spark.session import get_spark

    spark = get_spark("the_framework_for_clustering_time_series_data_spark-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    # untimed JVM/parquet-footer warm-up so the alphabetically-first
    # query does not absorb session startup (a1_value_stats read 5.8 s
    # in the r7 sweep vs ~1 s steady)
    first = sorted(queries)[0]
    queries[first](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_all = time.perf_counter()
    for i, name in enumerate(sorted(queries)):
        t0 = time.perf_counter()
        try:
            # noop write, same rationale as bench.py: count() prunes
            # window/projection work from the timed plan, collect()
            # adds driver serialization no pipeline pays at scale
            queries[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # record, keep sweeping
            errors[name] = f"{type(ex).__name__}: {ex}"[:200]
        spark.catalog.clearCache()
        # Per-query hygiene a long-lived query server would apply:
        # Python GC releases py4j references so the JVM can collect
        # retired plan trees/broadcasts (259 queries of accumulated
        # refs otherwise squeeze old-gen late in the sweep), and any
        # localCheckpoint blocks a query left behind are unpersisted
        # (clearCache only drops catalog-cached frames).
        gc.collect()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        it = jmap.entrySet().iterator()
        while it.hasNext():
            it.next().getValue().unpersist(True)
        print(
            f"[{i + 1}/{len(queries)}] {name}: "
            f"{timings.get(name, 'ERR')}s",
            file=sys.stderr,
        )
    total = round(time.perf_counter() - t_all, 1)
    record = {
        "metric": "full_registry_sweep",
        "n_queries": len(queries),
        "n_errors": len(errors),
        "total_sec": total,
        "sf_dir": args.sf_dir,
        "timings": timings,
        "errors": errors,
    }
    Path(args.out).write_text(json.dumps(record, indent=1))
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    print(
        json.dumps(
            {
                "n": len(queries),
                "errors": len(errors),
                "total_sec": total,
                "slowest15": dict(slow),
            }
        )
    )


if __name__ == "__main__":
    main()
