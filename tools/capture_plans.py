"""Capture .explain("formatted") for a set of registry queries into
plans/<tag>/<query>_<suffix>.txt — the judge-checkable record of plan
shapes before/after an optimization round.

Usage: python tools/capture_plans.py --tag r12 --suffix before [--queries a,b,c]
Defaults to the bench HEADLINE set.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from bench import HEADLINE
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import (
        formatted_plan,
        summarize_plan,
    )
    from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES
    from the_framework_for_clustering_time_series_data_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries.split(",") if args.queries else [n for n in HEADLINE if n in QUERIES]
    out_dir = Path(REPO) / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, args.sf_dir)
            plan = formatted_plan(df)
            stats = summarize_plan(df)
        except Exception as exc:  # noqa: BLE001 — capture must not abort the sweep
            print(f"{name}: ERROR {exc}", file=sys.stderr)
            continue
        # stage_checkpoint truncates .explain at `Scan ExistingRDD`,
        # so a checkpointed plan's stats undercount the work (the
        # checkpointed subtrees' exchanges still execute once at
        # runtime). Flag it, and append the FULL kernel plan captured
        # with the checkpoint seam disabled so exchange-count claims
        # can be made against like-for-like shapes.
        n_trunc = plan.count("Scan ExistingRDD")
        full_section = ""
        if n_trunc:
            spark.conf.set("spark.graft.checkpoint.disabled", "true")
            try:
                full_df = QUERIES[name](spark, args.sf_dir)
                full_plan = formatted_plan(full_df)
                full_stats = summarize_plan(full_df)
                full_section = (
                    "\n\n== full kernel plan (spark.graft.checkpoint.disabled"
                    "=true; production runs the truncated plan above, with "
                    "each checkpointed subtree executed once): "
                    + ", ".join(f"{k}={v}" for k, v in full_stats.items())
                    + "\n\n"
                    + full_plan
                )
            except Exception as exc:  # noqa: BLE001
                full_section = f"\n\n== full kernel plan capture FAILED: {exc}"
            finally:
                spark.conf.unset("spark.graft.checkpoint.disabled")
        path = out_dir / f"{name}_{args.suffix}.txt"
        header = (
            "== plan stats: "
            + ", ".join(f"{k}={v}" for k, v in stats.items())
            + (
                f", n_checkpoint_truncations={n_trunc}"
                " (stats EXCLUDE checkpointed subtrees; full plan below)"
                if n_trunc
                else ""
            )
        )
        path.write_text(header + "\n\n" + plan + full_section)
        print(f"{name}: exchanges={stats['n_exchanges']} bcast={stats['n_broadcast_exchanges']} trunc={n_trunc}")
    spark.stop()


if __name__ == "__main__":
    main()
