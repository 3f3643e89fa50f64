"""Regenerate OPERATORS.md from the live registry.

Usage: python tools/gen_operators_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    from the_framework_for_clustering_time_series_data_spark.plans.registry import ORACLE, QUERIES

    rows = []
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        module = fn.__module__.rsplit(".", 1)[-1]
        check = "oracle" if name in ORACLE else "rows-only"
        doc = (fn.__doc__ or "").strip().splitlines()
        summary = doc[0].strip() if doc else ""
        rows.append((name, module, check, summary))

    n_oracle = sum(1 for r in rows if r[2] == "oracle")
    out = [
        "# Operator / query index",
        "",
        f"Generated from the live registry (`plans/registry.py`) by "
        f"`tools/gen_operators_md.py`. {len(rows)} queries; {n_oracle} with "
        "full DuckDB value-hash oracles, the rest rows-only per the driver "
        "contract (hash-family / model / stub kernels, invariant-tested in "
        "`tests/`).",
        "",
        "| query | module | check | summary |",
        "|---|---|---|---|",
    ]
    for name, module, check, summary in rows:
        out.append(f"| `{name}` | {module} | {check} | {summary} |")
    (REPO / "OPERATORS.md").write_text("\n".join(out) + "\n")
    print(f"wrote OPERATORS.md: {len(rows)} queries, {n_oracle} oracles")


if __name__ == "__main__":
    main()
