"""Tests for the custom Python DataSource (sources/py_datasource.py):
closed-form values, partitioned parallel scan, filter pushdown, and
batch/stream parity through the micro-batch reader."""

from __future__ import annotations

from the_framework_for_clustering_time_series_data_spark.sources import py_datasource


def _load(spark, **opts):
    py_datasource.register(spark)
    r = spark.read.format(py_datasource.FORMAT_NAME)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_closed_form(spark):
    df = _load(spark, series=7, days=5)
    rows = {(r["series_id"], r["t"]): r["value"] for r in df.collect()}
    assert len(rows) == 7 * 5
    for (sid, t), v in rows.items():
        assert v == py_datasource._value(sid, t)


def test_scan_parallelism(spark):
    df = _load(spark, series=64, days=2, numPartitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 128


def test_filter_pushdown_equality(spark):
    df = _load(spark, series=50, days=4).filter("series_id = 11")
    got = sorted((r["t"], r["value"]) for r in df.collect())
    assert got == [(t, py_datasource._value(11, t)) for t in range(4)]
    # residual (non-pushable) predicates still apply post-scan
    df2 = _load(spark, series=50, days=4).filter("series_id = 11 AND t >= 2")
    assert df2.count() == 2


def test_stream_matches_batch(spark, tmp_path):
    py_datasource.register(spark)
    stream = (
        spark.readStream.format(py_datasource.FORMAT_NAME)
        .option("series", 5)
        .option("days", 6)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM synth_stream_sink").collect())
    )
    want = sorted(
        map(tuple, _load(spark, series=5, days=6).collect())
    )
    assert got == want
