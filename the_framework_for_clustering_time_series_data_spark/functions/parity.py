"""Shared oracle-parity canonicalization — ONE definition of "what
counts as the same result" across every consumer that replicates the
driver's correctness gate: tests/test_oracle_parity.py (the CI suite,
pinned session) and tools/vanilla_parity.py (the vanilla-session
check). Keeping both on this module means a change to the
canonicalization rule (rounding precision, NaN handling, a new table)
cannot silently desynchronize the two parity definitions."""

from __future__ import annotations

import math

#: every table the driver pre-registers as a DuckDB view
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str):
    """A DuckDB connection with all testdata tables registered as
    views over the given sf directory — the driver's oracle setup."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def norm_cell(v):
    """Order- and engine-insensitive cell form: floats to 6-dp fixed
    strings (NaN spelled out), lists to tuples, everything else
    verbatim."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 6):.6f}"
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def canon(cols, rows):
    """Canonical result form: columns sorted by name, every row a
    tuple of normalized cells, rows sorted — the comparison basis the
    driver's value hash uses."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
