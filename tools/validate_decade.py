"""Validate a gen_sf1.py decade's LOAD-BEARING construction properties
(the reasons the measured scaling exponents are trustworthy):

1. per-replica duplicate-group histograms equal the sf0.1 base's —
   the letter bijection preserved EVERY intra-replica dedup relation;
2. cross-replica text overlap is zero (distinct texts == R x base
   distinct) — banded joins grow in bucket COUNT, not bucket SIZE;
3. embedding norms match the base per vector — the per-replica
   transform is orthogonal;
4. sampled pairwise distances inside the LAST replica (the one using
   the newest transform family: rot/perm for docs, shift/perm+sign for
   embeddings) equal the base's — intra-replica ANN ground truth is
   preserved exactly.

Usage: python tools/validate_decade.py <decade-dir> <replicas>
(e.g. testdata_sf1 10, testdata_sf10 100). Exits non-zero on any
violation. DuckDB-only — no Spark session needed.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent))
from gen_sf1 import EMB_DIM, STRIDES  # noqa: E402  (shared source of truth)

DOC_STRIDE = STRIDES["documents"][1]
EMB_STRIDE = STRIDES["embeddings"][1]


def main() -> None:
    out, R = sys.argv[1], int(sys.argv[2])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW base_docs AS SELECT * FROM "
        "'/root/testdata/sf0.1/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    con.execute(
        "CREATE VIEW base_emb AS SELECT * FROM "
        "'/root/testdata/sf0.1/embeddings.parquet'"
    )
    con.execute(
        f"CREATE VIEW emb AS SELECT * FROM '{out}/embeddings.parquet/*.parquet'"
    )

    base_h = dict(
        con.execute(
            "SELECT cnt, count(*) FROM (SELECT text, count(*) cnt "
            "FROM base_docs GROUP BY 1) GROUP BY 1"
        ).fetchall()
    )
    reps = con.execute(f"""
SELECT doc_id // {DOC_STRIDE} AS r, cnt, count(*) FROM
  (SELECT doc_id // {DOC_STRIDE} AS r2, text, count(*) cnt,
          min(doc_id) AS doc_id
   FROM docs GROUP BY r2, text)
GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    per: dict[int, dict] = {}
    for r, cnt, n in reps:
        per.setdefault(r, {})[cnt] = n
    assert len(per) == R, (len(per), R)
    for r, h in per.items():
        assert h == base_h, (r, h, base_h)

    bd = con.execute("SELECT count(DISTINCT text) FROM base_docs").fetchone()[0]
    td = con.execute("SELECT count(DISTINCT text) FROM docs").fetchone()[0]
    assert td == R * bd, (td, R * bd)

    bad = con.execute(f"""
WITH b AS (SELECT vec_id, round(sqrt(list_aggregate(
             list_transform(embedding::DOUBLE[], x->x*x),'sum')),4) AS nb
           FROM base_emb),
e AS (SELECT vec_id % {EMB_STRIDE} AS vid,
             round(sqrt(list_aggregate(
               list_transform(embedding::DOUBLE[], x->x*x),'sum')),4) AS ne
      FROM emb)
SELECT count(*) FROM e JOIN b ON b.vec_id = e.vid
WHERE abs(e.ne - b.nb) > 1e-3""").fetchone()[0]
    assert bad == 0, f"{bad} norm mismatches"

    r = R - 1
    d = con.execute(f"""
WITH b AS (SELECT vec_id, embedding::DOUBLE[] v FROM base_emb WHERE vec_id < 50),
e AS (SELECT vec_id % {EMB_STRIDE} AS vid, embedding::DOUBLE[] v FROM emb
      WHERE vec_id // {EMB_STRIDE} = {r} AND vec_id % {EMB_STRIDE} < 50),
bp AS (SELECT a.vec_id i, c.vec_id j,
              round(sqrt(list_aggregate(list_transform(range(1, {EMB_DIM + 1}),
                k -> (a.v[CAST(k AS INT)]-c.v[CAST(k AS INT)])**2),'sum')),4) AS db
       FROM b a JOIN b c ON c.vec_id > a.vec_id),
ep AS (SELECT a.vid i, c.vid j,
              round(sqrt(list_aggregate(list_transform(range(1, {EMB_DIM + 1}),
                k -> (a.v[CAST(k AS INT)]-c.v[CAST(k AS INT)])**2),'sum')),4) AS de
       FROM e a JOIN e c ON c.vid > a.vid)
SELECT count(*) FROM bp JOIN ep ON ep.i=bp.i AND ep.j=bp.j
WHERE abs(db-de) > 1e-3""").fetchone()[0]
    assert d == 0, f"{d} pairwise-distance mismatches in replica {r}"

    print(
        f"decade at {out} (R={R}): dup histograms OK, cross-replica "
        f"overlap 0, norms OK, replica-{r} pairwise distances OK"
    )


if __name__ == "__main__":
    main()
