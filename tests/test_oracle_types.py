"""Fast (no-Spark) dtype audit of every DuckDB oracle.

The driver's correctness gate hashes raw fetched values, so an oracle
whose ``sum()`` over integers silently becomes DuckDB HUGEINT fails
the hash even when every value is identical to Spark's BIGINT output
(round-1 verdict: ``ts_burst_periods`` / ``q12_ship_latency``). This
sweep pins the oracle surface to the six type families the driver can
compare bit-stably, so the HUGEINT class can never recur: any bare
integer ``sum()`` must be wrapped ``CAST(... AS BIGINT)`` at the
oracle site.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_ORACLE

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: DuckDB result types the driver's hasher maps 1:1 onto Spark types.
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
           "VARCHAR", "BOOLEAN", "TIMESTAMP", "TIMESTAMP_NS", "DATE"}


def _con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    return con


def _oracles():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.oracle_sql().items())


def test_no_hugeint_or_exotic_types():
    con = _con()
    offenders = {}
    for name, sql in _oracles():
        rel = con.sql(sql)
        bad = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
               if str(ty) not in ALLOWED]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles producing driver-unhashable column types "
        f"(wrap integer sums in CAST(... AS BIGINT)): {offenders}"
    )


def test_allowed_matches_parity_family_surface():
    """The two type gates (this file's ALLOWED and test_oracle_parity's
    _DUCK_FAMILY) must enforce the SAME DuckDB-type surface — they
    drifted once (TIMESTAMP_NS) and the gap let one gate pass types the
    other rejected."""
    from tests.test_oracle_parity import _DUCK_FAMILY

    assert ALLOWED == set(_DUCK_FAMILY)


def test_sweep_detects_introduced_hugeint():
    """The gate itself must trip on a bare integer sum (HUGEINT)."""
    con = _con()
    rel = con.sql("SELECT sum(o_custkey) AS s FROM orders")
    assert str(rel.types[0]) == "HUGEINT"
    assert str(rel.types[0]) not in ALLOWED
