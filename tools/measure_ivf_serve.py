"""Serve-path honesty measurement for the persisted IVF family
(round-7 verdict ask #5; MLlib variant added round 8, ask #3): the
registry entries ``sim_ivfb_persisted`` and ``sim_ivf_persisted_topk``
deliberately measure build + persist + probe per invocation
(self-contained verified queries), which hides the serving probe's
real latency. This tool splits the two: build + persist ONCE, then
time the DPP-pruned probe alone over repeated runs — the number a
serving deployment actually sees per query batch. Both index builders
share ``ivf_probe_index``, so the probe numbers differ only by cell
assignment balance.

Usage: python tools/measure_ivf_serve.py [--sf-dir DIR] [--runs N]
       [--variant deterministic|mllib|both]
Prints one JSON line per variant: {"variant": ..., "build_persist_sec":
..., "probe_median_sec": ..., "probe_runs": [...], "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--variant",
        choices=[
            "deterministic", "mllib", "both", "streaming", "pqb",
            "sq8-streaming",
        ],
        default="both",
    )
    ap.add_argument(
        "--batches", type=int, default=4, help="streaming variant: batch count"
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from the_framework_for_clustering_time_series_data_spark.operators import similarity
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    emb = load_table(spark, args.sf_dir, "embeddings")
    emb.count()  # JVM/scan warmup so build_persist_sec isn't cold-start

    if args.variant == "streaming":
        # round-9 verdict ask #5 record: per-batch INCREMENTAL maintain
        # cost (streaming_ivf_index_maintainer's kernel) vs the full
        # rebuild the batch builders pay per snapshot. Batch 0 includes
        # the one-time quantizer train; steady batches are the number
        # that matters: O(batch) assignment + delta write + meta merge.
        from the_framework_for_clustering_time_series_data_spark.streaming.ops import (
            ivf_maintain_batch,
            streaming_ivf_probe,
        )

        if args.batches < 2:
            sys.exit("--variant streaming needs --batches >= 2 (a steady-"
                     "batch median requires at least one post-quantizer batch)")
        n = emb.count()
        per = (n + args.batches - 1) // args.batches
        rows = emb.orderBy("vec_id").collect()
        path = tempfile.mkdtemp(prefix="ivf_serve_streaming_")
        try:
            batch_secs = []
            for b in range(args.batches):
                chunk = spark.createDataFrame(
                    rows[b * per : (b + 1) * per], emb.schema
                )
                t0 = time.perf_counter()
                ivf_maintain_batch(chunk, b, path, n_cells=16)
                batch_secs.append(round(time.perf_counter() - t0, 3))
            queries = emb.where(F.col("vec_id") < 10)
            probes = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                streaming_ivf_probe(spark, path, queries, k=5, nprobe=4).collect()
                probes.append(round(time.perf_counter() - t0, 3))
            med = sorted(probes)[len(probes) // 2]
            steady = sorted(batch_secs[1:])[len(batch_secs[1:]) // 2]
            print(
                json.dumps(
                    {
                        "variant": "streaming",
                        "batches": args.batches,
                        "batch_secs": batch_secs,
                        "batch0_with_quantizer_sec": batch_secs[0],
                        "steady_batch_median_sec": steady,
                        "probe_median_sec": med,
                        "probe_runs": probes,
                        "sf_dir": args.sf_dir,
                    }
                )
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)
        return

    if args.variant == "sq8-streaming":
        # the SQ8 ingest record beside the IVF one: per-batch maintain
        # cost (frozen scales, pure per-row encode) vs the one-pass
        # frozen-scale batch rebuild, plus the delta-union probe
        from the_framework_for_clustering_time_series_data_spark.streaming.ops import (
            sq8_maintain_batch,
            sq8_probe_stream_index,
        )

        if args.batches < 2:
            sys.exit("--variant sq8-streaming needs --batches >= 2")
        n = emb.count()
        per = (n + args.batches - 1) // args.batches
        rows = emb.orderBy("vec_id").collect()
        path = tempfile.mkdtemp(prefix="sq8_serve_streaming_")
        try:
            batch_secs = []
            for b in range(args.batches):
                chunk = spark.createDataFrame(
                    rows[b * per : (b + 1) * per], emb.schema
                )
                t0 = time.perf_counter()
                sq8_maintain_batch(chunk, b, path)
                batch_secs.append(round(time.perf_counter() - t0, 3))
            # one-pass frozen-scale rebuild for comparison
            from the_framework_for_clustering_time_series_data_spark.operators.similarity import (
                _r6_corpus,
                sq8_encode,
            )

            scales = spark.read.parquet(f"{path}/scales")
            t0 = time.perf_counter()
            sq8_encode(_r6_corpus(emb, "vec_id", "embedding"), scales).write.mode(
                "overwrite"
            ).parquet(f"{path}/_rebuild")
            rebuild_s = round(time.perf_counter() - t0, 3)
            queries = emb.where(F.col("vec_id") < 10)
            probes = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                sq8_probe_stream_index(spark, path, queries, k=5).collect()
                probes.append(round(time.perf_counter() - t0, 3))
            med = sorted(probes)[len(probes) // 2]
            steady = sorted(batch_secs[1:])[len(batch_secs[1:]) // 2]
            print(
                json.dumps(
                    {
                        "variant": "sq8-streaming",
                        "batches": args.batches,
                        "batch_secs": batch_secs,
                        "batch0_with_scales_sec": batch_secs[0],
                        "steady_batch_median_sec": steady,
                        "full_rebuild_sec": rebuild_s,
                        "probe_median_sec": med,
                        "probe_runs": probes,
                        "sf_dir": args.sf_dir,
                    }
                )
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)
        return

    if args.variant == "pqb":
        # round-9 watch-item serve split (BASELINE.md "Round-9 watch
        # items"): sim_pqb_topk's construction phase is chained small
        # codebook jobs — persist the PQ index once and time the
        # broadcast-LUT ADC probe alone (sim_pqb_persisted's path).
        path = tempfile.mkdtemp(prefix="pq_serve_pqb_")
        try:
            t0 = time.perf_counter()
            similarity.build_pq_index_deterministic(emb, path, m=8, n_codes=16)
            build_s = round(time.perf_counter() - t0, 3)
            queries = emb.where(F.col("vec_id") < 10)
            probes = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                similarity.pq_probe_index(
                    spark, path, queries, k=5, rerank=50, m=8, n_codes=16
                ).collect()
                probes.append(round(time.perf_counter() - t0, 3))
            med = sorted(probes)[len(probes) // 2]
            print(
                json.dumps(
                    {
                        "variant": "pqb",
                        "build_persist_sec": build_s,
                        "probe_median_sec": med,
                        "probe_runs": probes,
                        "sf_dir": args.sf_dir,
                    }
                )
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)
        return

    builders = {
        "deterministic": similarity.build_ivf_index_deterministic,
        "mllib": similarity.build_ivf_index,
    }
    variants = (
        list(builders) if args.variant == "both" else [args.variant]
    )
    for variant in variants:
        path = tempfile.mkdtemp(prefix=f"ivf_serve_{variant}_")
        try:
            t0 = time.perf_counter()
            builders[variant](emb, path, n_cells=16)
            build_s = round(time.perf_counter() - t0, 3)

            queries = emb.where(F.col("vec_id") < 10)
            probes = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                similarity.ivf_probe_index(
                    spark, path, queries, k=5, nprobe=4
                ).collect()
                probes.append(round(time.perf_counter() - t0, 3))
            med = sorted(probes)[len(probes) // 2]
            print(
                json.dumps(
                    {
                        "variant": variant,
                        "build_persist_sec": build_s,
                        "probe_median_sec": med,
                        "probe_runs": probes,
                        "sf_dir": args.sf_dir,
                    }
                )
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
