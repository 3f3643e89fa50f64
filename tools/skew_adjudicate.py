"""Compare the skewed-decade sweep against the uniform decade and list
every query whose skew exponent exceeds the uniform exponent by more
than 0.1 (the round-9 verdict's adjudication threshold): ratios are
one-decade (10x) scalings, so the rule is
skew_ratio > uniform_ratio * 10**0.1 (~1.259x).

Usage: python tools/skew_adjudicate.py [SCALE_SF1_SKEW.json SCALE_SF1.json]
Prints a markdown table ready for BASELINE.md.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    skew_f = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "SCALE_SF1_SKEW.json")
    unif_f = sys.argv[2] if len(sys.argv) > 2 else str(REPO / "SCALE_SF1.json")
    skew = json.loads(Path(skew_f).read_text())
    unif = json.loads(Path(unif_f).read_text())
    thresh = 10 ** 0.1
    rows = []
    for name, r in skew["rows"].items():
        u = unif["rows"].get(name)
        sr = r.get("ratio")
        ur = u.get("ratio") if u else None
        if sr is None:
            continue
        exceeds = ur is not None and sr > ur * thresh
        rows.append((name, ur, sr, r["t1"], exceeds, ur is None))
    rows.sort(key=lambda x: -(x[2] / x[1] if x[1] else 0))
    print("| query | uniform ratio | skew ratio | skew t_sf1 (s) | flag |")
    print("|---|---|---|---|---|")
    for name, ur, sr, t1, exceeds, no_base in rows:
        flag = (
            "**ADJUDICATE**" if exceeds
            else ("no-uniform-row" if no_base else "ok")
        )
        de = (
            f"{math.log10(sr) - math.log10(ur):+.2f}e" if ur and sr else ""
        )
        print(f"| {name} | {ur} | {sr} {de} | {t1} | {flag} |")
    n_bad = sum(1 for r in rows if r[4])
    print(
        f"\n{len(rows)} compared, {n_bad} exceed uniform-exponent+0.1, "
        f"errors={skew['n_errors']}"
    )


if __name__ == "__main__":
    main()
