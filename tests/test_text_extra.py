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
