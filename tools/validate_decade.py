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


def validate(out: str, R: int) -> None:
    """Re-prove the UNIFORM decade's construction properties on the
    written output; raises AssertionError on any violation. Called
    automatically by gen_sf1.py (round-9 advice: a colliding decade
    must trip an error in the same invocation that wrote it)."""
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


def validate_skew(out: str, R: int) -> None:
    """Re-prove the SKEWED decade's (gen_sf1.py --skew) construction
    properties: row counts are exactly R× the base, the hot-user /
    hot-part / hot-language concentrations landed in their designed
    bands, and the heavy-tail document construction kept total char
    volume within ±10% of the uniform decade (so skew-vs-uniform
    exponent comparisons measure DISTRIBUTION, not volume)."""
    con = duckdb.connect()
    base = "/root/testdata/sf0.1"
    for t, mult in [("events", R), ("documents", R), ("lineitem", R), ("embeddings", R)]:
        b = con.execute(f"SELECT count(*) FROM '{base}/{t}.parquet'").fetchone()[0]
        s = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet/*.parquet'").fetchone()[0]
        assert s == mult * b, (t, s, mult * b)

    # hot users: 25 global users carry ~25% of all events (150x a
    # uniform user's share)
    hot = con.execute(
        f"SELECT sum(CASE WHEN user_id < 25 THEN 1 ELSE 0 END)::DOUBLE / count(*) "
        f"FROM '{out}/events.parquet/*.parquet'"
    ).fetchone()[0]
    assert 0.20 <= hot <= 0.30, f"hot-user event share {hot:.3f} outside [0.20,0.30]"

    # hot parts: 10 global partkeys carry ~20% of lineitem rows
    hotp = con.execute(
        f"SELECT sum(CASE WHEN l_partkey < 10 THEN 1 ELSE 0 END)::DOUBLE / count(*) "
        f"FROM '{out}/lineitem.parquet/*.parquet'"
    ).fetchone()[0]
    assert 0.15 <= hotp <= 0.25, f"hot-part lineitem share {hotp:.3f} outside [0.15,0.25]"

    # hot language: 'en' dominates (~80%)
    en = con.execute(
        f"SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE / count(*) "
        f"FROM '{out}/documents.parquet/*.parquet'"
    ).fetchone()[0]
    assert en >= 0.75, f"hot-language share {en:.3f} < 0.75"

    # heavy-tail doc lengths: volume-neutral-ish (±10% of uniform), but
    # the max doc is >= 20x the base max and n_chars stays == length(text)
    bchars = con.execute(f"SELECT sum(n_chars), max(n_chars) FROM '{base}/documents.parquet'").fetchone()
    schars = con.execute(
        f"SELECT sum(n_chars), max(n_chars), "
        f"sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) "
        f"FROM '{out}/documents.parquet/*.parquet'"
    ).fetchone()
    ratio = schars[0] / (R * bchars[0])
    assert 0.90 <= ratio <= 1.10, f"char volume ratio vs uniform {ratio:.3f} outside ±10%"
    assert schars[1] >= 20 * bchars[1], (schars[1], bchars[1])
    assert schars[2] == 0, f"{schars[2]} rows where n_chars != length(text)"

    # hot ANN direction: ~10% of vectors share one direction (cosine to
    # the hot vector ~1) — one hot IVF cell by construction
    frac = con.execute(f"""
WITH hv AS (SELECT embedding::DOUBLE[] v FROM '{out}/embeddings.parquet/*.parquet'
            WHERE vec_id = 0),
e AS (SELECT embedding::DOUBLE[] v FROM '{out}/embeddings.parquet/*.parquet'),
cs AS (SELECT list_aggregate(list_transform(range(1, {EMB_DIM + 1}),
         k -> e.v[CAST(k AS INT)] * hv.v[CAST(k AS INT)]), 'sum')
       / sqrt(list_aggregate(list_transform(e.v, x->x*x), 'sum'))
       / sqrt(list_aggregate(list_transform(hv.v, x->x*x), 'sum')) AS c
      FROM e CROSS JOIN hv)
SELECT sum(CASE WHEN c > 0.999 THEN 1 ELSE 0 END)::DOUBLE / count(*) FROM cs
""").fetchone()[0]
    assert 0.05 <= frac <= 0.15, f"hot-direction vector share {frac:.3f} outside [0.05,0.15]"

    print(
        f"skewed decade at {out} (R={R}): counts R×base OK, hot users "
        f"{hot:.2f}, hot parts {hotp:.2f}, lang-en {en:.2f}, char volume "
        f"{ratio:.3f}× uniform, hot-direction vectors {frac:.2f}"
    )


def main() -> None:
    out, R = sys.argv[1], int(sys.argv[2])
    if len(sys.argv) > 3 and sys.argv[3] == "--skew":
        validate_skew(out, R)
    else:
        validate(out, R)


if __name__ == "__main__":
    main()
