"""Streaming-maintainer throughput record (round-10 verdict ask #8):
the ANN index maintainers (IVF / SQ8) and the ingest-time simhash
dedup are parity- and crash-tested but were never perf-measured. This
drives each one over the sf1 tables as a real Structured Streaming
query (file source, maxFilesPerTrigger=1, availableNow) and reports
the ENGINE's own per-micro-batch numbers from the query progress log
(numInputRows / triggerExecution duration → rows/s per batch).

Usage: python tools/measure_streaming_throughput.py [--sf-dir DIR]
Prints one JSON line; run IDLE (timed artifact)."""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _progress_rows(q) -> list[dict]:
    rows = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        n = int(d.get("numInputRows", 0))
        ms = int(d.get("durationMs", {}).get("triggerExecution", 0))
        if n == 0 and ms == 0:
            continue
        rows.append(
            {
                "batch": int(d.get("batchId", -1)),
                "rows": n,
                "sec": round(ms / 1000.0, 2),
                "rows_per_sec": round(n / (ms / 1000.0), 0) if ms else None,
            }
        )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=str(REPO / "testdata_sf1"))
    args = ap.parse_args()

    from the_framework_for_clustering_time_series_data_spark.preflight import memory_preflight
    from the_framework_for_clustering_time_series_data_spark.session import get_spark

    memory_preflight([args.sf_dir], label="streaming throughput run")
    spark = get_spark("the_framework_for_clustering_time_series_data_spark-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from the_framework_for_clustering_time_series_data_spark.streaming import ops

    sf = Path(args.sf_dir)
    emb_schema = spark.read.parquet(str(sf / "embeddings.parquet")).schema
    doc_schema = spark.read.parquet(str(sf / "documents.parquet")).schema
    out: dict[str, dict] = {}

    def run(name, make_query):
        work = Path(tempfile.mkdtemp(prefix=f"stream_bench_{name}_"))
        t0 = time.perf_counter()
        q = make_query(work)
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches = _progress_rows(q)
        total = sum(b["rows"] for b in batches)
        busy = sum(b["sec"] for b in batches)
        out[name] = {
            "batches": batches,
            "total_rows": total,
            "wall_sec": round(wall, 2),
            "steady_rows_per_sec": (
                round(total / busy, 0) if busy else None
            ),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)

    def emb_stream():
        return (
            spark.readStream.schema(emb_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(sf / "embeddings.parquet"))
        )

    run(
        "streaming_ivf_index_maintainer",
        lambda w: ops.streaming_ivf_index_maintainer(
            emb_stream(), str(w / "idx"), str(w / "ckpt"), n_cells=16
        ),
    )
    run(
        "streaming_sq8_index_maintainer",
        lambda w: ops.streaming_sq8_index_maintainer(
            emb_stream(), str(w / "idx"), str(w / "ckpt")
        ),
    )
    run(
        "streaming_simhash_dedup",
        lambda w: ops.streaming_simhash_dedup(
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(sf / "documents.parquet")),
            str(w / "idx"),
            str(w / "ckpt"),
        ),
    )

    print(json.dumps({"metric": "streaming_throughput", "sf_dir": args.sf_dir, "ops": out}))


if __name__ == "__main__":
    main()
