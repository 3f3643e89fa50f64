"""Storage-layout tests: partition pruning and bucketed shuffle-free
joins must be visible in the physical plan, not just assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from the_framework_for_clustering_time_series_data_spark.sources import writers
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "ev_part")
    writers.write_partitioned(
        writers.with_event_date(ev), path, partition_cols=["event_date"]
    )
    back = spark.read.parquet(path)
    one_day = back.select("event_date").first()["event_date"]
    q = back.where(F.col("event_date") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter lands in PartitionFilters (directory pruning), not a
    # post-scan Filter over data rows
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    assert "PushedFilters: []" in plan or "event_date" not in plan.split("PushedFilters")[1][:120]
    # and the data is intact / the filter selects a strict subset
    assert back.count() == ev.count()
    assert 0 < q.count() < ev.count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
        agg = ev.groupBy("user_id").agg(F.sum("value").alias("total"))
        writers.write_bucketed(ev, "ev_b", "user_id", n_buckets=4)
        writers.write_bucketed(agg, "agg_b", "user_id", n_buckets=4)
        j = spark.table("ev_b").join(spark.table("agg_b"), "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert j.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS agg_b")


def test_csv_single_file_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    path = str(tmp_path / "out_csv")
    writers.write_csv(df, path, single_file=True)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 2
    import glob

    assert len(glob.glob(f"{path}/part-*.csv")) == 1


def test_jsonl_roundtrip_documents(spark, tmp_path):
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table
    from the_framework_for_clustering_time_series_data_spark.sources.writers import read_jsonl, write_jsonl

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(
        spark, path, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    assert back.count() == docs.count()
    a = {r["doc_id"]: (r["text"], r["lang"], r["n_chars"]) for r in docs.collect()}
    b = {r["doc_id"]: (r["text"], r["lang"], r["n_chars"]) for r in back.collect()}
    assert a == b


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    """A fragmented dataset (64 tiny files) compacts to few files with
    identical content; partitioned mode keeps the hive layout."""
    import glob

    from the_framework_for_clustering_time_series_data_spark.sources.writers import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    df = spark.range(10_000).selectExpr("id", "id % 3 AS g", "rand(7) AS v")
    df.repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 64

    n = compact_parquet(spark, src, dst, target_file_mb=1)
    out_files = glob.glob(dst + "/*.parquet")
    assert len(out_files) <= 4, out_files
    assert n == len(out_files)
    got = spark.read.parquet(dst)
    assert got.count() == 10_000
    assert got.selectExpr("sum(id)").first()[0] == df.selectExpr("sum(id)").first()[0]

    dst2 = str(tmp_path / "compacted_part")
    compact_parquet(spark, src, dst2, target_file_mb=1, partition_cols=["g"])
    parts = glob.glob(dst2 + "/g=*")
    assert len(parts) == 3, parts
    assert spark.read.parquet(dst2).count() == 10_000


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    """Z-order layout must make per-file value ranges narrow on BOTH
    clustered columns simultaneously — the property parquet min/max
    skipping needs. A lexicographic sort only achieves it for the
    leading key; a random layout for neither."""
    ev = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    path = str(tmp_path / "ev_z")
    writers.write_zordered(ev, path, ["user_id", "value"], bits=6, n_files=8)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()

    files = back.inputFiles()
    assert len(files) > 3, files
    g = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("su"),
        (F.max("value") - F.min("value")).alias("sv"),
    ).first()
    spans_u, spans_v = [], []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("su"),
                (F.max("value") - F.min("value")).alias("sv"),
            )
            .first()
        )
        spans_u.append(r["su"] / g["su"])
        spans_v.append(r["sv"] / g["sv"])
    mean_u = sum(spans_u) / len(spans_u)
    mean_v = sum(spans_v) / len(spans_v)
    # each file should cover well under the full range on BOTH dims
    # (8 files × 2 dims → ideal ≈ 1/sqrt(8) ≈ 0.35 per dim)
    assert mean_u < 0.7, (mean_u, spans_u)
    assert mean_v < 0.7, (mean_v, spans_v)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    import re

    from the_framework_for_clustering_time_series_data_spark.sources.writers import read_orc, write_orc
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)
    # predicate pushdown reaches the ORC scan like the parquet scans
    import contextlib
    import io

    filtered = back.where(F.col("l_quantity") > 45.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_quantity", plan)
    exact = li.where(F.col("l_quantity") > 45.0).count()
    assert filtered.count() == exact


def test_merge_schema_evolution_read(spark, tmp_path):
    # lakehouse schema evolution: later partitions gain a column; a
    # mergeSchema scan must unify the schema and null-fill old files
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    v1.write.parquet(base + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, 30.0, "en"), (4, 40.0, "de")], "id long, v double, lang string"
    )
    v2.write.parquet(base + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert sorted(df.columns) == ["batch", "id", "lang", "v"]
    rows = {r["id"]: (r["v"], r["lang"]) for r in df.collect()}
    assert rows[1] == (10.0, None) and rows[3] == (30.0, "en")
    # and the narrow read (no mergeSchema) still prunes to one file's schema
    one = spark.read.parquet(base + "/batch=1")
    assert sorted(one.columns) == ["id", "v"]


def test_compact_preserve_order_keeps_pruning(spark, tmp_path):
    """Order-preserving compaction (round-7 layout-maintenance op):
    a fragmented CLUSTERED dataset compacts to few files that stay
    disjoint, contiguous ranges of the cluster key — per-file footer
    min/max survive, so range predicates skip files after compaction
    exactly as before. Round-robin compact_parquet is asserted to
    LOSE the property on the same data (the reason this op exists)."""
    import glob

    from the_framework_for_clustering_time_series_data_spark.sources.writers import (
        compact_parquet,
        compact_parquet_preserve_order,
    )

    # 48 small files (~7 MB total), globally clustered on id
    src = str(tmp_path / "frag")
    df = spark.range(800_000).selectExpr("id", "rand(11) AS v")
    df.repartitionByRange(48, "id").sortWithinPartitions("id").write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 48

    dst = str(tmp_path / "compacted")
    compact_parquet_preserve_order(spark, src, dst, ["id"], target_file_mb=1)
    out_files = sorted(glob.glob(dst + "/*.parquet"))
    assert 1 < len(out_files) <= 12, out_files

    got = spark.read.parquet(dst)
    assert got.count() == 800_000
    assert (
        got.selectExpr("sum(id)").first()[0]
        == df.selectExpr("sum(id)").first()[0]
    )

    def file_ranges(files):
        out = []
        for f in files:
            r = spark.read.parquet(f).agg(
                F.min("id").alias("lo"), F.max("id").alias("hi")
            ).first()
            out.append((r["lo"], r["hi"]))
        return sorted(out)

    ranges = file_ranges(out_files)
    # disjoint contiguous key ranges: every file's min exceeds the
    # previous file's max — the exact property footer pruning needs
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges
    # and the ranges cover the data
    assert ranges[0][0] == 0 and ranges[-1][1] == 799_999

    # a point/range predicate physically scans ONE file
    hit = (
        spark.read.parquet(dst)
        .where(F.col("id").between(100, 200))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert hit == 1

    # contrast: round-robin compaction of the same source loses the
    # property — files overlap over the whole key range
    dst2 = str(tmp_path / "compacted_rr")
    compact_parquet(spark, src, dst2, target_file_mb=1)
    rr_files = sorted(glob.glob(dst2 + "/*.parquet"))
    if len(rr_files) > 1:
        rr = file_ranges(rr_files)
        overlaps = sum(
            1 for (l1, h1), (l2, h2) in zip(rr, rr[1:]) if h1 >= l2
        )
        assert overlaps > 0, rr


def test_compaction_refuses_in_place_all_spellings():
    """The in-place guard must catch URI spellings of the same
    location, not just string-equal paths — overwrite-while-lazily-
    reading destroys the dataset being compacted."""
    import pytest

    from the_framework_for_clustering_time_series_data_spark.sources.writers import _guard_distinct_paths

    for src, dst in [
        ("/data/events", "/data/events"),
        ("/data/events", "file:///data/events"),
        ("s3a://bucket/x", "s3a://bucket/x/"),
        ("/data/./events", "/data/events"),
    ]:
        with pytest.raises(ValueError, match="must differ"):
            _guard_distinct_paths(src, dst)
    # distinct locations pass
    _guard_distinct_paths("/data/events", "/data/events_compact")
    _guard_distinct_paths("s3a://bucket/x", "s3a://other/x")


def test_compaction_refuses_nested_paths():
    """Round-8 advice: equal-location checks are not enough — a dst
    NESTED under the source root plants foreign part files inside the
    source dataset (corrupting later recursive reads), and a src
    nested under dst is truncated by the overwrite. Both directions
    must be rejected, component-wise (no false positive on the
    sibling prefix '/data/events_compact')."""
    import pytest

    from the_framework_for_clustering_time_series_data_spark.sources.writers import _guard_distinct_paths

    for src, dst in [
        ("/data/events", "/data/events/compact"),
        ("/data/events/compact", "/data/events"),
        ("file:///data/events", "/data/events/deep/nest"),
        ("s3a://bucket/x", "s3a://bucket/x/compact"),
        ("s3a://bucket/x/y", "s3a://bucket/x"),
    ]:
        with pytest.raises(ValueError, match="must not nest"):
            _guard_distinct_paths(src, dst)
    # component-wise: string-prefix SIBLINGS are fine, as are same
    # paths on different authorities/schemes
    _guard_distinct_paths("/data/events", "/data/events_compact/out")
    _guard_distinct_paths("s3a://bucket/x", "s3a://other/x/compact")
    _guard_distinct_paths("s3a://bucket/x", "file:///bucket/x/compact")
