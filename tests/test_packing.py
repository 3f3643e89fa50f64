"""Invariant tests for the training-batch assembly plans
(plans/packing_plans.py). Exact values are covered by the DuckDB
oracle parity test; these check the packing geometry and mixture
accounting at sf0.001.
"""

from __future__ import annotations

import math

from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

from tests.conftest import SF_SMALL

CHUNK = 2048


def test_pack_tiles_token_stream(spark):
    rows = QUERIES["pack_sequences_chunks"](spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    n_chunks = max(r.first_chunk + r.chunks_spanned for r in rows)
    # the packed stream ends in the last chunk, with no chunk past it
    assert n_chunks == math.ceil(total / CHUNK)
    for r in rows:
        assert r.chunks_spanned >= 1
        # a doc can straddle at most n_tokens//CHUNK + 1 chunks
        assert r.chunks_spanned <= r.n_tokens // CHUNK + 2
    # every chunk up to the last is touched by at least one doc
    touched = set()
    for r in rows:
        touched.update(range(r.first_chunk, r.first_chunk + r.chunks_spanned))
    assert touched == set(range(n_chunks))


def test_mix_rates_and_counts(spark):
    rows = QUERIES["mix_langs_resample"](spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n_in for r in rows)
    target = total / len(rows)
    for r in rows:
        assert 0 < r.rate <= 1.0
        assert 0 <= r.n_out <= r.n_in
        if r.rate == 1.0:
            # underrepresented languages keep everything
            assert r.n_out == r.n_in
            assert r.n_in <= target + 1e-9


def test_assembly_splits_and_packing_consistency(spark):
    rows = QUERIES["corpus_training_assembly"](spark, SF_SMALL).collect()
    assert rows
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"}
    train = sorted((r for r in rows if r.split == "train"), key=lambda r: r.first_chunk)
    # only train docs are packed, and chunk ids start at 0 without holes
    assert all(r.first_chunk is None for r in rows if r.split != "train")
    chunks = sorted({r.first_chunk for r in train})
    assert chunks[0] == 0
    assert all(b - a <= 1 for a, b in zip(chunks, chunks[1:]))
    # the mixture keeps at most ~uniform share per language (cap + hash noise)
    from collections import Counter
    by_lang = Counter(r.lang for r in rows)
    target = sum(by_lang.values()) / len(by_lang)
    assert max(by_lang.values()) <= 2.2 * target
