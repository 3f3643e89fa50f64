"""Multimodal (image/audio/video) column handling for training-data
pipelines: opaque ``binary`` payloads + typed metadata, with decode /
feature-extraction / frame-sampling as Arrow-batched ``mapInPandas``
stages.

The image/audio decode libraries are NOT in this container, so the
decode kernels are DETERMINISTIC STUBS (seeded from the payload bytes,
clearly marked). Everything Spark-side — schema, batching, partition
behavior, UDF signatures — is real: swapping the stub body for
PIL/ffmpeg calls is a one-function change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REAL_DECODERS_AVAILABLE = False  # no PIL/cv2/ffmpeg in this environment


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column + metadata struct.

    Here the payload is the utf-8 encoding of the text column (the
    test corpus has no real media); in production this is the raw
    image/audio bytes read from object storage.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ),
    )


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode each payload and emit image features (width, height,
    mean intensity).

    STUB KERNEL: real decoding needs PIL/cv2 (absent here). The stand-in
    derives deterministic pseudo-features from the payload bytes so the
    distributed plumbing (Arrow batches, schema, partition-parallel
    mapInPandas) is exercised end to end. Replace ``_decode`` with a
    real decoder to productionize.
    """
    import hashlib

    import pandas as pd

    out_schema = f"{id_col} long, width int, height int, mean_intensity double"

    def _decode(payload: bytes) -> tuple[int, int, float]:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("wire PIL/cv2 decode here")
        h = hashlib.sha256(payload).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        mean_intensity = round(sum(h[2:10]) / 8 / 255, 6)
        return width, height, mean_intensity

    def run(batches):
        for pdf in batches:
            feats = [_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats, columns=["width", "height", "mean_intensity"])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame sampling: emit ``n_frames`` evenly-spaced frame
    records per payload (frame_idx + per-frame pseudo-digest).

    STUB KERNEL (no ffmpeg): frame digests are deterministic slices of
    the payload hash. The output shape — one row per (media, frame),
    produced inside mapInPandas so a 10 GB video never leaves its
    executor — is the real contract.
    """
    import hashlib

    import pandas as pd

    out_schema = f"{id_col} long, frame_idx int, frame_md5 string"

    def run(batches):
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(p)
                for i in range(n_frames):
                    rows.append(
                        {
                            id_col: did,
                            "frame_idx": i,
                            "frame_md5": hashlib.md5(
                                payload + i.to_bytes(4, "little")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_md5"])

    return df.select(id_col, "payload").mapInPandas(run, schema=out_schema)


def extract_audio_features(
    df: DataFrame, n_windows: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Audio decode + feature extraction: per-payload (duration,
    sample rate, peak dBFS) plus an ``n_windows``-slot RMS loudness
    envelope (array<double>).

    STUB KERNEL (no soundfile/ffmpeg in this container): the features
    are deterministic functions of the payload hash. The Spark-side
    contract is real — Arrow-batched mapInPandas, one row per clip
    with a fixed-length envelope array, so a multi-GB audio file is
    decoded where its bytes already live and only the tiny feature
    row crosses the wire.
    """
    import hashlib

    import pandas as pd

    out_schema = (
        f"{id_col} long, duration_s double, sample_rate int, "
        "peak_dbfs double, rms_envelope array<double>"
    )

    def _decode(payload: bytes) -> tuple[float, int, float, list[float]]:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("wire soundfile/ffmpeg decode here")
        h = hashlib.sha256(payload).digest()
        duration = round(1.0 + h[0] / 16, 3)
        rate = (8, 16, 22, 44, 48)[h[1] % 5] * 1000
        peak = round(-(h[2] % 24) - h[3] / 255, 3)
        env = [round(h[4 + i] / 255, 6) for i in range(n_windows)]
        return duration, rate, peak, env

    def run(batches):
        for pdf in batches:
            feats = [_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["duration_s", "sample_rate", "peak_dbfs", "rms_envelope"]
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(run, schema=out_schema)
