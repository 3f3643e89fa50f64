"""BPE merge learning: exact merge order on the classic example, and
corpus-scale sanity."""

from __future__ import annotations


def test_bpe_merge_order_classic(spark):
    # words: hug pug pun bun hugs (each once). Pair counts round 1:
    # (u,g)=3 wins; round 2: (h,ug)=2 ties (u,n)=2 -> lexicographic
    # (h,ug) wins; round 3: (u,n)=2.
    from the_framework_for_clustering_time_series_data_spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, "hug pug pun"), (2, "bun hugs")], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges(docs, n_merges=3).orderBy("rank").collect()
    ]
    assert got == [(0, "u", "g", 3), (1, "h", "ug", 2), (2, "u", "n", 2)]


def test_bpe_merges_deterministic_and_monotone_on_corpus(spark):
    from tests.conftest import SF_SMALL
    from the_framework_for_clustering_time_series_data_spark.operators.text import bpe_learn_merges
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    a = [tuple(r) for r in bpe_learn_merges(docs, n_merges=5).orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_learn_merges(docs, n_merges=5).orderBy("rank").collect()]
    assert a == b and len(a) == 5
    # merged symbols grow out of earlier merges or single chars
    known = set()
    for _, left, right, n in a:
        assert n > 0
        for side in (left, right):
            assert len(side) == 1 or side in known
        known.add(left + right)


def test_round7_llm_query_invariants(spark):
    """Structural invariants for the round-7 additions, on top of their
    value-hash oracles: MMR's rank-1 pick IS the plain cosine top-1,
    selections are distinct and pool-bounded; feature AUCs are valid
    probabilities with the token-count feature (x4) dominant (quality
    embeds a token-count term by construction); boilerplate fractions
    are exact-count ratios in [0,1]; JL distortion is a shared-quanta
    difference with the expected O(1/sqrt(m)) magnitude."""
    from tests.conftest import SF_ORACLE
    from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

    mmr = QUERIES["retrieval_mmr_rerank"](spark, SF_ORACLE).collect()
    top1 = {
        (r["query_id"], r["nbr_id"])
        for r in QUERIES["sim_bruteforce_topk"](spark, SF_ORACLE).collect()
        if r["rank"] == 1
    }
    by_q: dict = {}
    for r in mmr:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 3
    for qid, rows in by_q.items():
        assert len(rows) == 10
        assert len({r["nbr_id"] for r in rows}) == 10
        first = min(rows, key=lambda r: r["mmr_rank"])
        assert (qid, first["nbr_id"]) in top1

    aucs = {r["feature"]: r["auc"] for r in QUERIES["ml_auc_features"](spark, SF_ORACLE).collect()}
    assert set(aucs) == {f"x{i}" for i in range(1, 7)}
    assert all(0.0 <= a <= 1.0 for a in aucs.values())
    assert aucs["x4"] > 0.9  # log token count ranks the quartile extremes

    bp = QUERIES["text_boilerplate_shingles"](spark, SF_ORACLE).collect()
    assert bp and all(0 <= r["n_boiler"] <= r["n_grams"] for r in bp)
    assert all(abs(r["boiler_frac"] * r["n_grams"] - r["n_boiler"]) < 1 for r in bp)

    jl = QUERIES["emb_rand_projection"](spark, SF_ORACLE).collect()
    assert len(jl) == 435
    import statistics
    errs = [r["abs_err"] for r in jl]
    assert all(abs(r["abs_err"] - abs(r["cos_orig"] - r["cos_proj"])) < 2e-6 for r in jl)
    assert statistics.mean(errs) < 3 / 16 ** 0.5  # JL: O(1/sqrt(m)) distortion


def test_unigram_estep_gate_branches_identical(spark):
    """The size-gated E-step (round-9 review fix) must produce
    IDENTICAL schedules and per-word segment counts on both branches —
    driver-side exact-int loop (below the gate) and Arrow-batched
    distributed segmentation (above it, forced with driver_words=0) —
    plus the max_piece digit-encoding guard."""
    import pytest

    from tests.conftest import SF_SMALL
    from the_framework_for_clustering_time_series_data_spark.operators.text import unigram_lm_fit
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(200)
    sched_d, npf_d = unigram_lm_fit(docs, rounds=2, top_k=20)
    sched_x, npf_x = unigram_lm_fit(docs, rounds=2, top_k=20, driver_words=0)
    assert sched_d == sched_x
    assert sorted(map(tuple, npf_d.collect())) == sorted(
        map(tuple, npf_x.collect())
    )
    with pytest.raises(ValueError, match="max_piece"):
        unigram_lm_fit(docs, max_piece=10)
