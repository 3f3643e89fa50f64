"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]``; the configs below are the ones that
matter identically on a 1000-executor cluster: AQE (runtime re-plan,
skew-join splitting, partition coalescing), Arrow for the pandas-UDF
slow path, and shuffle-partition sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "the_framework_for_clustering_time_series_data_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Adaptive execution: runtime partition coalescing + skew-join
        # splitting — the knob that keeps plans healthy at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # The driver testdata stores events.ts as TIMESTAMP(NANOS), which
        # Spark's parquet reader rejects by default — read as long nanos
        # and convert at the source (sources.tables.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Naive parquet timestamps (events.ts) must mean the same instant
        # in Spark and the DuckDB oracle: pin UTC.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow transfer for the pandas-UDF operators (DTW/UMAP/K-Shape…).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else int(cpus)),
        )
        # Broadcast threshold: small dims (region/nation/centroids) must
        # broadcast, never shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # measurement seam: SPARK_GRAFT_DRIVER_JAVA_OPTS="-Xlog:gc*:file=…"
    # lets a sweep capture GC logs for heap-pressure adjudication (the
    # round-11 c8@sf100 GCLocker finding) without code edits
    extra_java = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if extra_java:
        builder = builder.config("spark.driver.extraJavaOptions", extra_java)
    return builder.getOrCreate()
