"""Multimodal binary-column ops: payload/metadata schema, stub decode
determinism, and per-frame fan-out shape (stub kernels, real Arrow
batching — see operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from the_framework_for_clustering_time_series_data_spark.operators import multimodal
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


def _docs(spark):
    return multimodal.attach_payload(load_table(spark, SF_SMALL, "documents"))


def test_attach_payload_metadata_consistent(spark):
    d = _docs(spark)
    bad = d.where(
        (F.col("media_meta.n_bytes") != F.octet_length("payload"))
        | (F.col("media_meta.content_md5") != F.md5("payload"))
    )
    assert bad.count() == 0
    assert dict(d.dtypes)["payload"] == "binary"


def test_image_features_deterministic_and_bounded(spark):
    d = _docs(spark)
    a = sorted(map(tuple, multimodal.decode_image_features(d).collect()))
    b = sorted(map(tuple, multimodal.decode_image_features(d).collect()))
    assert a == b
    assert all(64 <= r[1] <= 255 and 64 <= r[2] <= 255 and 0 <= r[3] <= 1 for r in a)


def test_frame_sample_fanout_shape(spark):
    d = _docs(spark)
    n_docs = d.count()
    frames = multimodal.sample_frames(d, n_frames=4)
    assert frames.count() == 4 * n_docs
    per = frames.groupBy("doc_id").agg(
        F.countDistinct("frame_idx").alias("n_idx"),
        F.countDistinct("frame_md5").alias("n_digests"),
    )
    assert per.where((F.col("n_idx") != 4) | (F.col("n_digests") != 4)).count() == 0


def test_audio_features_shape_and_determinism(spark):
    d = _docs(spark)
    out = multimodal.extract_audio_features(d, n_windows=8)
    rows = out.collect()
    assert len(rows) == d.count()
    assert all(len(r["rms_envelope"]) == 8 for r in rows)
    assert all(r["peak_dbfs"] <= 0.0 and r["duration_s"] > 0 for r in rows)
    again = out.collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
