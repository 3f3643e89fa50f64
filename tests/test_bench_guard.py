"""bench.py artifact policy: subset runs must never clobber the
committed full-headline anchor (round-11 verdict finding #1 — a
3-query --queries re-verification overwrote the 51-query
BENCH_FULL.json idle anchor)."""

import bench


def test_partial_runs_write_their_own_artifact():
    assert bench.detail_filename(None) == "BENCH_FULL.json"
    assert bench.detail_filename("") == "BENCH_FULL.json"  # no subset given
    assert bench.detail_filename("q1_pricing_summary") == "BENCH_PARTIAL.json"
    assert bench.detail_filename("a,b,c") == "BENCH_PARTIAL.json"


def test_canary_constant_is_headline():
    """The load canary must stay a headline query (round-12: bench
    emits canary_ratio = canary steady / canary median as per-run load
    evidence; it can only do that if the canary is benched)."""
    import bench

    assert bench._CANARY in bench.HEADLINE
