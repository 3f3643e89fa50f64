"""Coverage-ledger integrity: every query name CLAIMED in SURVEY.md §8
or OPERATORS.md must exist in the live registry — the ledger is the
coverage contract a reader greps, and round 3 shipped two names that
had drifted from the registry (audit_repeated_spans /
dsir_importance_sample)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

#: snake_case prefixes that denote REGISTERED QUERY names when they
#: appear in SURVEY §8 prose (helper functions/operators are named
#: outside these families or carry module paths)
_QUERY_PREFIX = re.compile(
    r"^(q\d+|ts|dedup|sim|mm|dq|corpus|layout|mix|dsir|text|pack|curate|"
    r"graph|st|flagship|[acdegijprt]\d+[a-z]?|sj\d+|k\d+)_[a-z0-9_]+$"
)

#: §8 identifiers matching the prefix families that are NOT registry
#: queries (operator/function names cited in prose)
_EXEMPT = {
    "graph_plans",  # module name cited in prose, not a query
}


def _registry_names():
    from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

    return set(QUERIES)


def test_survey_s8_names_exist_in_registry():
    text = Path(REPO / "SURVEY.md").read_text()
    s8 = text.split("## 8.", 1)[1]
    tokens = set(re.findall(r"[a-z][a-z0-9_]*", s8))
    claimed = {
        t for t in tokens if _QUERY_PREFIX.match(t) and t not in _EXEMPT
    }
    missing = sorted(claimed - _registry_names())
    assert not missing, f"SURVEY §8 claims unregistered query names: {missing}"


def test_operators_md_in_sync_with_registry():
    text = Path(REPO / "OPERATORS.md").read_text()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    reg = _registry_names()
    assert listed == reg, (
        f"OPERATORS.md stale — regenerate with tools/gen_operators_md.py; "
        f"extra={sorted(listed - reg)[:5]} missing={sorted(reg - listed)[:5]}"
    )


def test_rows_only_notes_cover_exactly_the_rows_only_set():
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from gen_operators_md import ROWS_ONLY_NOTES

    from the_framework_for_clustering_time_series_data_spark.plans.registry import ORACLE, QUERIES

    rows_only = set(QUERIES) - set(ORACLE)
    assert set(ROWS_ONLY_NOTES) == rows_only, (
        f"annotate new rows-only entries / drop notes for converted ones: "
        f"missing={sorted(rows_only - set(ROWS_ONLY_NOTES))} "
        f"stale={sorted(set(ROWS_ONLY_NOTES) - rows_only)}"
    )


def test_survey_head_counts_match_live_registry():
    """Round-6 verdict ask #7: SURVEY's HEAD-state registry line said
    257/236 while the live registry was 258/237 (post-close additions
    landed after the doc line was written). The HEAD line is marked
    'commit-anchored HEAD state' — assert the numbers in it equal the
    imported registry so the doc can never silently lag again."""
    from the_framework_for_clustering_time_series_data_spark.plans.registry import ORACLE, QUERIES

    text = Path(REPO / "SURVEY.md").read_text()
    m = re.search(
        r"\*\*(\d+) queries / (\d+) oracles\*\* \(the commit-anchored HEAD",
        text,
    )
    assert m, "SURVEY.md lost its commit-anchored HEAD-state count line"
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), len(ORACLE)), (
        f"SURVEY.md HEAD-state line says {m.group(1)}/{m.group(2)} but the "
        f"live registry is {len(QUERIES)}/{len(ORACLE)} — update the line"
    )


def test_bench_compact_line_stays_inside_capture_window():
    """The driver tail-captures ~2000 chars of bench stdout; round 3's
    combined line overflowed it (BENCH_r03.json parsed:null). Simulate
    the emission logic with the CURRENT headline set and worst-case
    timing widths and assert the line stays under the window — and
    that the slowest-N fallback would engage before ever exceeding it
    for a full-registry sweep."""
    import json

    from bench import HEADLINE

    # worst case: every query formats at the 2-dp compact width 99.99,
    # plus the compact median map (5 slowest of the 10 measured) — the
    # round-5 compact-line economy (full precision lives in
    # BENCH_FULL.json)
    timings = {q: 99.99 for q in HEADLINE}
    median5 = {q: 99.99 for q in HEADLINE[:5]}
    compact = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "median5": median5,
        "sf": 0.1,
        "detail": "BENCH_FULL.json",
    }
    line = json.dumps(compact)
    # REALISTIC widths (sub-10s per query at sf0.1) must fit outright…
    realistic = dict(
        compact,
        queries={q: 9.99 for q in HEADLINE},
        median5={q: 9.99 for q in HEADLINE[:5]},
    )
    assert len(json.dumps(realistic)) <= 1900, "realistic line overflows"
    # …and if the WORST case overflows, the runtime fallback (slowest
    # 20 + the compact median map) must bring it back inside the window
    if len(line) > 1900:
        fb = dict(compact)
        fb["queries"] = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:20]
        )
        fb["queries_truncated_to_slowest"] = 20
        line = json.dumps(fb)
    assert len(line) <= 1900, f"headline line {len(line)} chars overflows"

    # sweep-sized map must trigger the fallback branch condition
    sweep = {f"query_name_number_{i:03d}": 99.999 for i in range(206)}
    compact["queries"] = sweep
    assert len(json.dumps(compact)) > 1900  # fallback would engage
    slowest = dict(sorted(sweep.items(), key=lambda kv: -kv[1])[:20])
    compact["queries"] = slowest
    compact["queries_truncated_to_slowest"] = len(slowest)
    assert len(json.dumps(compact)) <= 1900


def test_plans_md_prose_matches_its_own_table():
    """Round-8 verdict ask #4: the regenerated PLANS.md table showed 0
    CartesianProduct rows while the reading-guide prose still named
    one (stale generator template text). The narrative is now DERIVED
    from the scan in tools/gen_plans_md.py — assert the committed doc
    agrees with itself so it can never contradict its table again."""
    text = Path(REPO / "PLANS.md").read_text()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \| \S+ \| .*$", text, re.M)
    cart_rows = [
        m.group(1)
        for m in re.finditer(r"^\| `([a-z0-9_]+)` \|(?: [^|]*\|){4} YES \|", text, re.M)
    ]
    assert rows, "PLANS.md lost its table"
    if not cart_rows:
        assert "ZERO CartesianProduct" in text, (
            "table has no cartesians but the prose does not say so — "
            "regenerate with tools/gen_plans_md.py"
        )
        assert "The one CartesianProduct in the registry" not in text
    else:
        for name in cart_rows:
            assert f"`{name}`" in text.split("| query |")[0], (
                f"cartesian plan {name} not named in the reading guide — "
                "regenerate with tools/gen_plans_md.py"
            )
