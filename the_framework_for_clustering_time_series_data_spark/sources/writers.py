"""Table writers encoding the engine's storage-layout contract at
cluster scale: date-partitioned facts (partition pruning) and
key-bucketed tables (shuffle-free co-located joins).

The reference's only sinks are two CSV downloads (K1/K2,
/root/reference/app.py:1835-1864); these are the layouts a 100 TB
deployment actually writes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import lit_double_array


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K1/K2/K3 — CSV export with header. ``single_file`` coalesces to
    one part (driver-adjacent download semantics, small tables only)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("event_date",),
    fmt: str = "parquet",
) -> None:
    """Write a fact table hive-partitioned on low-cardinality columns
    (typically a derived date). Readers filtering on the partition
    column scan only matching directories (PartitionFilters in the
    plan), which is THE first-order pruning lever at 100 TB."""
    df.write.mode("overwrite").format(fmt).partitionBy(*partition_cols).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) catalog table:
    co-partitions the data by hash(bucket_col) at WRITE time, so a join
    or aggregation on that key by a reader needs NO shuffle (Spark
    matches its hash partitioning to the bucket spec). Requires the
    session catalog (saveAsTable) — bucketing metadata lives there."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def with_event_date(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the partition column for event facts (UTC date string —
    stable across session timezones)."""
    return df.withColumn(
        "event_date", F.date_format(F.to_utc_timestamp(F.col(ts_col), "UTC"), "yyyy-MM-dd")
    )


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """JSON-lines egress (the interchange format of LLM-corpus tooling):
    one JSON object per row, optionally gzip-compressed per part file —
    splittable at the file level, written in parallel by every task."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark, path: str, schema: str | None = None):
    """JSON-lines ingest. Pass an explicit DDL ``schema`` in production:
    schema inference costs a full extra pass over the data, and a typo'd
    field silently becomes null columns — both disasters at corpus
    scale. Falls back to inference only when ``schema`` is None (ad-hoc
    exploration)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)


def _guard_distinct_paths(src_path: str, dst_path: str) -> None:
    """Refuse in-place compaction: mode("overwrite") TRUNCATES the
    destination before the lazy source read completes, so
    dst == src would destroy the data being compacted. Paths are
    compared after URI normalization so spellings of the SAME location
    ('/data/x' vs 'file:///data/x'; 's3a://b/x' vs 's3a://b/x/') can't
    slip past the guard — for local/file schemes via Path.resolve, for
    remote schemes via (scheme, authority, normalized path). NESTED
    locations are rejected too (round-8 advice): writing
    '/data/events/compact' under source root '/data/events' plants
    foreign parquet parts inside the source dataset (corrupting later
    recursive reads of it), and a source nested under dst is truncated
    by the overwrite — prefix containment is checked path-component-
    wise in both directions."""
    import posixpath
    from pathlib import Path
    from urllib.parse import urlparse

    def key(p: str):
        u = urlparse(p)
        if u.scheme in ("", "file"):
            return ("file", "", str(Path(u.path or p).resolve()))
        return (u.scheme, u.netloc, posixpath.normpath(u.path or "/"))

    ks, kd = key(src_path), key(dst_path)
    if ks == kd:
        raise ValueError(
            f"dst_path must differ from src_path ({src_path!r}): "
            "overwrite truncates the destination while the source is "
            "still being read lazily — in-place compaction loses data"
        )

    def parts(k):
        return tuple(seg for seg in k[2].split("/") if seg)

    if ks[:2] == kd[:2]:
        ps, pd = parts(ks), parts(kd)
        if ps[: len(pd)] == pd or pd[: len(ps)] == ps:
            raise ValueError(
                f"src_path ({src_path!r}) and dst_path ({dst_path!r}) "
                "must not nest: a dst under the source root plants "
                "foreign part files inside the source dataset, and a "
                "src under dst is truncated by the overwrite"
            )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 256,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    roughly ``target_file_mb`` each (the standard maintenance pass —
    streaming sinks and fine-grained ingestion leave thousands of tiny
    files whose per-file open/footer cost dominates scans at scale).

    File count is sized from the dataset's actual on-disk bytes, then
    the data is redistributed with repartition (round-robin — no key
    skew) or, when ``partition_cols`` is given, repartitioned BY those
    columns so each hive partition's files are written by tasks holding
    only that partition's rows (avoids the every-task-writes-every-
    partition small-file explosion repartition(n) would reintroduce).
    Returns the number of files requested.
    """
    _guard_distinct_paths(src_path, dst_path)
    df = spark.read.parquet(src_path)
    # inputFiles() lists paths; size them via Hadoop FS (metadata only, no data read)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs_bytes = 0
    for p in df.inputFiles():
        path = jvm.org.apache.hadoop.fs.Path(p)
        fs = path.getFileSystem(conf)
        fs_bytes += fs.getFileStatus(path).getLen()
    n_files = max(1, round(fs_bytes / (target_file_mb * 1024 * 1024)))
    if partition_cols:
        (
            df.repartition(n_files, *partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(dst_path)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Z-order-clustered parquet write: rows are laid out along a
    Morton curve over ``zorder_cols`` so that EVERY clustered column is
    locally narrow within each file/row-group — parquet min/max
    statistics then skip most files for range predicates on ANY of the
    dimensions, not just the first sort key (the limitation of a plain
    lexicographic sort).

    Mechanics (all JVM-side, one extra metadata pass):
    1. per column, 2^bits approximate quantile boundaries
       (``approxQuantile``, driver-held, tiny) define an equi-depth
       bucket id — rank-based, so skew and wild value ranges are
       neutralized;
    2. bucket ids are bit-interleaved into a Morton code with
       shiftleft/bitwise-or expressions;
    3. ``repartitionByRange`` on the code (range exchange ≈ curve
       segments) + ``sortWithinPartitions`` orders rows within each
       output file.

    At 100 TB this is the standard layout-maintenance pass (e.g. after
    compaction) for fact tables queried on several independent
    dimensions.
    """
    from pyspark.sql import Column

    spark = df.sparkSession
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bucket_cols: list[Column] = []
    for c in zorder_cols:
        dc = F.col(c).cast("double")
        qs = df.select(dc.alias("_q")).approxQuantile("_q", probs, 0.01)
        # strictly increasing boundary subset (duplicates appear on
        # low-cardinality columns); bucket = count of boundaries <= v,
        # rescaled onto the FULL 2^bits range — otherwise a column with
        # few distinct boundaries only populates its low bits and the
        # interleave's high bits (the curve's coarsest splits) would be
        # driven by the other columns alone
        bounds = sorted(set(qs))
        barr = lit_double_array(bounds)
        raw = F.size(F.filter(barr, lambda b: b <= dc))
        bucket_cols.append(
            F.floor(raw * n_buckets / (len(bounds) + 1)).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, bc in enumerate(bucket_cols):
            bit = F.shiftright(bc, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, i * len(bucket_cols) + j).cast("long")
            )
    out = df.withColumn("_z", z)
    if n_files is None:
        n_files = max(out.rdd.getNumPartitions(), 1)
    (
        out.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_orc(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> None:
    """ORC sink (Spark-native vectorized reader/writer): the columnar
    alternative where the surrounding lakehouse is Hive/ORC-based.
    Same layout options as the parquet writers — predicate pushdown,
    column pruning, and partition pruning all apply identically
    (PushedFilters shows in the scan node either way)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str):
    return spark.read.orc(path)


def compact_parquet_preserve_order(
    spark,
    src_path: str,
    dst_path: str,
    cluster_cols: Sequence[str],
    target_file_mb: int = 256,
) -> int:
    """Order-preserving small-file compaction — the layout-MAINTENANCE
    pass (round-7): bin-pack a fragmented dataset into files of roughly
    ``target_file_mb`` WITHOUT destroying its cluster order.
    ``compact_parquet``'s round-robin repartition fixes the file-count
    problem but scrambles rows across files, erasing the per-file
    min/max narrowness that footer pruning needs — after THIS pass the
    files are disjoint, contiguous ranges of ``cluster_cols``, so
    range predicates on the cluster key keep skipping files exactly as
    they did before compaction.

    Mechanics: file count sized from actual on-disk bytes (FS metadata
    only, as compact_parquet), then ONE range exchange
    (``repartitionByRange`` samples the key distribution, so output
    files are equi-depth in rows, immune to key skew) +
    ``sortWithinPartitions`` to restore within-file order. No
    all-to-one sort, no driver data. Returns the file count requested.
    """
    _guard_distinct_paths(src_path, dst_path)
    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs_bytes = 0
    for p in df.inputFiles():
        path = jvm.org.apache.hadoop.fs.Path(p)
        fs = path.getFileSystem(conf)
        fs_bytes += fs.getFileStatus(path).getLen()
    n_files = max(1, round(fs_bytes / (target_file_mb * 1024 * 1024)))
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    return n_files
