"""Hypothesis property tests (SURVEY.md §5.2): randomized invariants
for the normalizers and length-alignment operators. Few examples per
property (each example runs Spark jobs); deadline disabled for JVM
warmup jitter.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SERIES = st.lists(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=5,
)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _long_df(spark, series):
    rows = [
        (sid, t, float(v))
        for sid, vals in enumerate(series)
        for t, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "series_id long, t long, value double")


@given(series=SERIES)
@PROP_SETTINGS
def test_minmax_zscore_invariants(spark, series):
    from the_framework_for_clustering_time_series_data_spark.operators.prep import with_global_normalized

    df = _long_df(spark, series)
    out = with_global_normalized(df).collect()
    vals = [r["value"] for r in out]
    mm = [r["min_max"] for r in out]
    zs = [r["z_score"] for r in out]
    lo, hi = min(vals), max(vals)
    if hi > lo:
        assert all(-1e-9 <= m <= 1 + 1e-9 for m in mm)
        assert math.isclose(sum(zs) / len(zs), 0.0, abs_tol=1e-6)
        # population std of z-scores ≈ 1
        var = sum(z * z for z in zs) / len(zs)
        assert math.isclose(var, 1.0, rel_tol=1e-6)


@given(series=SERIES)
@PROP_SETTINGS
def test_truncate_pad_invariants(spark, series):
    from the_framework_for_clustering_time_series_data_spark.operators.align import pad_to_max, truncate_to_min

    df = _long_df(spark, series)
    min_len = min(len(s) for s in series)
    max_len = max(len(s) for s in series)

    tr = truncate_to_min(df).groupBy("series_id").count().collect()
    assert all(r["count"] == min_len for r in tr)

    pd_rows = pad_to_max(df).collect()
    by_sid = {}
    for r in pd_rows:
        by_sid.setdefault(r["series_id"], []).append((r["t"], r["value"]))
    for sid, pts in by_sid.items():
        pts.sort()
        assert len(pts) == max_len
        # suffix beyond the original length is the pad value 0.0
        for t, v in pts[len(series[sid]):]:
            assert v == 0.0


@given(
    length=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=10),
    s=st.integers(min_value=1, max_value=5),
)
@PROP_SETTINGS
def test_sliding_window_count(spark, length, w, s):
    from the_framework_for_clustering_time_series_data_spark.operators.align import sliding_windows

    df = spark.createDataFrame(
        [(0, t, float(t)) for t in range(length)], "series_id long, t long, value double"
    )
    out = sliding_windows(df, window_size=w, shift_size=s)
    n_windows = out.select("window_id").distinct().count()
    expect = max(0, (length - w) // s + 1) if length >= w else 0
    assert n_windows == expect
    if expect:
        per = out.groupBy("window_id").count().collect()
        assert all(r["count"] == w for r in per)


def test_bigram_fluency_prefers_predictable_text(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.text import bigram_fluency

    # predictable docs repeat one phrase; the noise doc pairs words that
    # appear in no other bigram context
    phrase = "the quick brown fox jumps over the lazy dog"
    rows = [(i, phrase) for i in range(8)]
    rows.append((99, "dog the over quick lazy jumps fox brown the"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_fluency(df).collect()}
    assert len(out) == 9
    assert all(out[i]["n_bigrams"] == 8 for i in range(8))
    # every repeated doc outscores the shuffled doc
    assert all(out[i]["fluency"] > out[99]["fluency"] for i in range(8))


def test_repetition_flags_degenerate_text(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.text import repetition_score

    rows = [
        (1, "alpha beta gamma " * 30),                   # one 3-gram cycle, high repetition
        (2, " ".join(f"w{i}" for i in range(90))),       # all distinct, zero repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_score(df).collect()}
    assert out[2]["rep_ratio"] == 0.0
    assert out[1]["rep_ratio"] > 0.9
    assert out[1]["n_distinct"] == 3  # the cycle has exactly 3 distinct 3-grams


def test_decontamination_flags_planted_overlap(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.text import decontaminate_overlap

    eval_set = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words then the secret benchmark answer is copied here"),
            (2, "completely unrelated clean training document text here now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate_overlap(corpus, eval_set, n=4).collect()}
    assert set(out) == {1}
    assert out[1]["n_overlap"] >= 2  # "the secret benchmark answer", "secret benchmark answer is"


# --- stdlib codec kernels (no Spark jobs — generous example counts) ---

@settings(max_examples=60, deadline=None)
@given(
    pcm=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=16, max_size=520
    ),
    sub=st.sampled_from(["fixed0", "fixed1", "fixed2", "verbatim", "lpc"]),
    esc=st.booleans(),
)
def test_flac_roundtrip_property(pcm, sub, esc):
    """Any int16 signal through any subframe/escape combination must
    decode to exactly the WAV-path features of the same PCM (FLAC is
    lossless; both paths share the feature math)."""
    from tests.test_multimodal import _encode_flac, _wav_payload
    from the_framework_for_clustering_time_series_data_spark.operators.multimodal import (
        decode_flac_features,
        decode_wav_features,
    )

    payload = _encode_flac(
        [pcm], blocksize=len(pcm), subframe=sub, escape=esc
    )
    assert decode_flac_features(payload) == decode_wav_features(_wav_payload(pcm))


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    n_colors=st.integers(min_value=2, max_value=16),
    real=st.booleans(),
    data=st.data(),
)
def test_gif_roundtrip_property(w, h, n_colors, real, data):
    """Any index grid over any palette, through either LZW form, must
    decode to the closed-form palette-luma mean."""
    from tests.test_multimodal import _encode_gif
    from the_framework_for_clustering_time_series_data_spark.operators.multimodal import decode_gif_stdlib

    palette = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=3 * n_colors,
            max_size=3 * n_colors,
        )
    )
    indices = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=n_colors - 1),
            min_size=w * h,
            max_size=w * h,
        )
    )
    luma = [
        (299 * palette[3 * i] + 587 * palette[3 * i + 1]
         + 114 * palette[3 * i + 2] + 500) // 1000
        for i in range(n_colors)
    ]
    expect = round(sum(luma[p] for p in indices) / (w * h) / 255.0, 6)
    got = decode_gif_stdlib(_encode_gif(indices, w, h, palette, real_lzw=real))
    assert got == (w, h, expect)


GRID_98 = st.lists(
    st.lists(st.integers(min_value=0, max_value=255), min_size=9, max_size=9),
    min_size=8,
    max_size=8,
)


@given(grid=GRID_98, shift=st.integers(min_value=-50, max_value=50))
@settings(max_examples=30, deadline=None)
def test_dhash_brightness_shift_invariant(grid, shift):
    """dHash compares adjacent pixels with strict > — adding a global
    brightness offset (the classic re-exposure transform) never
    changes any bit. Pure-Python kernels, no Spark per example."""
    from the_framework_for_clustering_time_series_data_spark.operators.multimodal import dhash64_from_luma

    shifted = [[p + shift for p in row] for row in grid]
    assert dhash64_from_luma(grid, 9, 8) == dhash64_from_luma(shifted, 9, 8)


@given(
    grid=st.lists(
        st.lists(st.integers(min_value=0, max_value=255), min_size=18, max_size=18),
        min_size=16,
        max_size=16,
    )
)
@settings(max_examples=20, deadline=None)
def test_dhash_downscale_2x_exact_means(grid):
    """For an 18×16 grid the 9×8 downscale boxes are exact 2×2 blocks:
    the kernel must equal dHash of the floor box means computed by
    hand — the downscale path cannot drift from its spec."""
    from the_framework_for_clustering_time_series_data_spark.operators.multimodal import dhash64_from_luma

    manual = [
        [
            (grid[2 * r][2 * c] + grid[2 * r][2 * c + 1]
             + grid[2 * r + 1][2 * c] + grid[2 * r + 1][2 * c + 1]) // 4
            for c in range(9)
        ]
        for r in range(8)
    ]
    assert dhash64_from_luma(grid, 18, 16) == dhash64_from_luma(manual, 9, 8)


@given(
    samples=st.lists(
        st.integers(min_value=0, max_value=255), min_size=520, max_size=520
    )
)
@settings(max_examples=30, deadline=None)
def test_afp64_reflection_invariant(samples):
    """Window energies use (s − zero)², so reflecting every sample
    around the zero level (phase inversion, the classic polarity flip)
    never changes a fingerprint bit."""
    from the_framework_for_clustering_time_series_data_spark.operators.multimodal import afp64_from_samples

    reflected = [256 - s for s in samples]
    assert afp64_from_samples(samples, zero=128) == afp64_from_samples(
        reflected, zero=128
    )
