"""Generate sf1 (10x sf0.1) test data for the SCALE-VALIDATION sweep
(round-9 verdict ask #1): every perf record so far is sf0.1, so the
100-TB design story rests on plan shape + targeted 1M-5M-row smokes.
This tool materializes a deterministic 10x decade at
``/root/repo/testdata_sf1/`` (the driver's /root/testdata is
read-only) so tools/scale_sweep.py can convert "plans look linear"
into measured per-query scaling ratios.

Construction: R deterministic replicas of the driver's sf0.1 tables
(default 10 = sf1; 100 = sf10, the second measured decade) with
TPC-H-style semantics — fixed dims stay fixed, fact keys offset per
replica, the DATE RANGE stays constant (density xR, exactly how dbgen
scales):

- region/nation: copied once (constant at every SF, as in TPC-H).
- customer/supplier/part/orders/lineitem: keys offset by
  ``r * (max_key + 1)``; FK columns offset consistently so referential
  integrity holds; key-derived names re-derived from the new key.
- events: event_id/user_id offset (10x users over the same 30 days —
  series COUNT scales, per-series length does not, matching how a
  fleet's event volume actually grows).
- documents: doc_id offset; text mapped through a per-replica letter
  BIJECTION — rot-r (a-z cyclic shift) for r < 26, a seeded
  Fisher-Yates permutation of the alphabet beyond (LCG keyed by the
  replica index; mappings asserted pairwise-distinct). This is the
  load-bearing choice: any letter bijection preserves EVERY
  intra-replica relation exactly (lengths, token stats,
  duplicate/near-dup/shingle structure — so dedup work per replica is
  identical to sf0.1) while distinct bijections destroy cross-replica
  overlap (so LSH buckets/exact-hash groups grow Rx in COUNT, not Rx
  in SIZE — naive doc_id-only replication would make every banded
  join quadratic by CONSTRUCTION of the data, polluting the measured
  exponents). n_chars is length-invariant under any bijection.
- embeddings: vec_id offset; vectors pass through a per-replica
  ORTHOGONAL transform — circular dim shift by r for r < 64, a seeded
  dim permutation + sign flips beyond (norm- and
  intra-replica-distance-preserving either way, so ANN ground truth
  per replica matches sf0.1; cross-replica vectors decorrelate
  instead of producing R exact zero-distance copies of every point).

Determinism: pure column transforms of the seed=42 driver data — the
only pseudo-randomness is the replica-indexed LCG shuffles, replayable
from the replica index alone. tools/validate_decade.py re-proves the
construction properties on the generated output. Output layout
mirrors the driver's (``<dir>/<table>.parquet``), written by Spark
(multi-part dirs: the scan parallelism a real table has).

``--skew`` (round-10 verdict ask #1) layers deterministic SKEW on the
same R-replica volume — both measured decades so far are uniform
replicas, but 100 TB corpora are Zipf in key frequency and doc length.
Four independent axes, each keyed on xxhash64 of the row's global id
(replayable, no RNG), designed to keep TOTAL volume comparable to the
uniform decade so skew-vs-uniform exponent deltas measure
DISTRIBUTION, not size:

- events: 25 GLOBAL hot users carry ~25% of all rows (~150x a uniform
  user's share) — the straggling-reducer shape salted_sum_count and
  every per-series operator must survive;
- lineitem: 10 global hot partkeys carry ~20% of rows — skewed
  build-side join keys for the TPC-H plans (AQE skew-join territory);
- documents: heavy-tail lengths (0.1% of docs x40, 0.9% x12, 9% x4,
  the rest truncated to 60%: expected char volume ≈ 1.05x uniform,
  max doc ~40x median) plus a hot language (~80% 'en') — the
  shingle/levenshtein kernels meet real length skew and
  mix_langs_resample meets a dominant stratum; n_chars is recomputed
  so the length invariant holds;
- embeddings: ~10% of vectors collapse onto ONE direction (the base
  vec 0, scaled by a tiny per-row factor) — one hot IVF/LSH cell by
  construction, the ANN-bucket imbalance a crawl of boilerplate
  embeddings produces.

Both modes auto-validate on exit (tools/validate_decade.py: uniform
construction proofs, or the skew concentration bands) — a decade that
violates its construction can no longer be written without tripping
an error in the same invocation (round-9 advice).

Usage: python tools/gen_sf1.py [--out /root/repo/testdata_sf1] [--replicas 10]
       python tools/gen_sf1.py --skew  [--out /root/repo/testdata_sf1_skew]
"""

from __future__ import annotations

import argparse
import string
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"

# key strides = max(key) + 1 in the sf0.1 driver data (asserted below)
STRIDES = {
    "customer": ("c_custkey", 15_000),
    "supplier": ("s_suppkey", 1_000),
    "part": ("p_partkey", 20_000),
    "orders": ("o_orderkey", 150_000),
    "events": ("event_id", 100_000),
    "documents": ("doc_id", 5_000),
    "embeddings": ("vec_id", 2_000),
}
USER_STRIDE = 1_500  # events.user_id in 0..1499 at sf0.1
EMB_DIM = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--skew", action="store_true")
    args = ap.parse_args()
    if args.out is None:
        args.out = str(
            REPO / ("testdata_sf1_skew" if args.skew else "testdata_sf1")
        )

    from pyspark.sql import functions as F

    from the_framework_for_clustering_time_series_data_spark.session import get_spark
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    spark = get_spark("gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    R = args.replicas

    def replicate(df, parts: int):
        """Cross the frame with the replica grid (broadcast literal —
        the one crossJoin shape the repo allows) and repartition so the
        output dir has realistic multi-part scan parallelism. Part
        counts were sized for the 10-replica decade; scale them with
        R so sf10 files stay in the driver's per-file size band."""
        reps = spark.range(R).select(F.col("id").cast("int").alias("_r"))
        return df.crossJoin(F.broadcast(reps)), max(parts, parts * R // 10)

    def offset(col: str, stride: int):
        return (F.col(col) + F.col("_r").cast("long") * F.lit(stride)).alias(col)

    def write(df, name: str, parts: int) -> None:
        t0 = time.perf_counter()
        (
            df.repartition(parts)
            .write.mode("overwrite")
            .parquet(str(out / f"{name}.parquet"))
        )
        n = spark.read.parquet(str(out / f"{name}.parquet")).count()
        print(f"  {name}: {n} rows in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # replica transforms must be pairwise DISTINCT bijections or
    # cross-replica exact duplicates reappear — precisely the overlap
    # this construction exists to destroy (review finding, round 9).
    # r < 26 uses rot-r (keeps the sf1 decade reproducible bit-for-bit
    # with the round-9 record); r >= 26 uses a seeded Fisher-Yates
    # letter PERMUTATION (an LCG keyed by r — same intra-replica
    # bijection guarantees as rot, 26!-sized key space), asserted
    # distinct below. Embeddings analogously: circular dim shift for
    # r < 64, seeded dim-permutation + sign flips (orthogonal, so
    # norms and intra-replica distances are preserved exactly) beyond.
    assert 1 <= R <= 2000, f"replicas must be in 1..2000, got {R}"

    def _lcg_shuffle(n: int, seed: int) -> list[int]:
        """Deterministic Fisher-Yates permutation of range(n) driven by
        a 64-bit LCG (MMIX constants) — no RNG module, fully replayable
        from the replica index alone."""
        state = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        perm = list(range(n))
        for i in range(n - 1, 0, -1):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            j = (state >> 33) % (i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        return perm

    az = string.ascii_lowercase

    def letter_map(r: int) -> str:
        if r < 26:
            return az[r:] + az[:r]
        return "".join(az[i] for i in _lcg_shuffle(26, r))

    letter_maps = [letter_map(r) for r in range(R)]
    assert len(set(letter_maps)) == R, "letter bijections must be distinct"

    def emb_transform(r: int) -> tuple[list[int], list[float]]:
        """(source-dim permutation, sign flips) for replica r: output
        dim i reads source dim perm[i] times sign[i]."""
        if r < EMB_DIM:
            return [(i + r) % EMB_DIM for i in range(EMB_DIM)], [1.0] * EMB_DIM
        perm = _lcg_shuffle(EMB_DIM, r * 2 + 1)
        state = (r * 2 + 2) * 0x9E3779B97F4A7C15 % (1 << 64)
        signs = []
        for _ in range(EMB_DIM):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            signs.append(1.0 if (state >> 40) & 1 else -1.0)
        return perm, signs

    emb_transforms = [emb_transform(r) for r in range(R)]
    assert len({(tuple(p), tuple(s)) for p, s in emb_transforms}) == R, (
        "embedding transforms must be distinct"
    )

    # sanity: strides really are max_key+1 in the source (a drifted
    # driver regeneration would silently collide replica keys) —
    # including the events.user_id FK-ish stride, which is offset but
    # is not a STRIDES primary key
    for t, (k, stride) in STRIDES.items():
        mx = load_table(spark, SRC, t).agg(F.max(k)).collect()[0][0]
        assert mx == stride - 1, f"{t}.{k} max {mx} != stride-1 {stride - 1}"
    mx_user = load_table(spark, SRC, "events").agg(F.max("user_id")).collect()[0][0]
    assert mx_user == USER_STRIDE - 1, f"events.user_id max {mx_user} != {USER_STRIDE - 1}"

    # fixed dims: copy once, unchanged
    for t in ("region", "nation"):
        write(load_table(spark, SRC, t), t, 1)

    cust, p = replicate(load_table(spark, SRC, "customer"), 4)
    write(
        cust.select(
            offset("c_custkey", STRIDES["customer"][1]),
            F.format_string("Customer#%09d", offset("c_custkey", STRIDES["customer"][1])).alias("c_name"),
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        ),
        "customer",
        p,
    )

    supp, p = replicate(load_table(spark, SRC, "supplier"), 1)
    write(
        supp.select(
            offset("s_suppkey", STRIDES["supplier"][1]),
            F.format_string("Supplier#%09d", offset("s_suppkey", STRIDES["supplier"][1])).alias("s_name"),
            "s_nationkey",
            "s_acctbal",
        ),
        "supplier",
        p,
    )

    part_df, p = replicate(load_table(spark, SRC, "part"), 4)
    write(
        part_df.select(
            offset("p_partkey", STRIDES["part"][1]),
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        ),
        "part",
        p,
    )

    orders, p = replicate(load_table(spark, SRC, "orders"), 8)
    write(
        orders.select(
            offset("o_orderkey", STRIDES["orders"][1]),
            offset("o_custkey", STRIDES["customer"][1]),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
        "orders",
        p,
    )

    li, p = replicate(load_table(spark, SRC, "lineitem"), 16)
    # --skew: 10 GLOBAL hot partkeys absorb ~20% of lineitem rows —
    # keyed on the row's global identity (orderkey, linenumber) so the
    # choice is replayable; partkeys 0..9 exist in every replica-0 dim
    pk = offset("l_partkey", STRIDES["part"][1])
    if args.skew:
        li_rid = F.xxhash64(
            offset("l_orderkey", STRIDES["orders"][1]), F.col("l_linenumber")
        )
        pk = (
            F.when(F.pmod(li_rid, F.lit(100)) < 20, F.pmod(F.xxhash64(li_rid), F.lit(10)))
            .otherwise(F.col("l_partkey") + F.col("_r").cast("long") * STRIDES["part"][1])
            .cast("long")
            .alias("l_partkey")
        )
    write(
        li.select(
            offset("l_orderkey", STRIDES["orders"][1]),
            pk,
            offset("l_suppkey", STRIDES["supplier"][1]),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ),
        "lineitem",
        p,
    )

    ev, p = replicate(load_table(spark, SRC, "events"), 8)
    # --skew: 25 GLOBAL hot users (ids 0..24, valid replica-0 users)
    # carry ~25% of all events — ~150x a uniform user's share
    uid = offset("user_id", USER_STRIDE)
    if args.skew:
        ev_gid = offset("event_id", STRIDES["events"][1])
        uid = (
            F.when(
                F.pmod(F.xxhash64(ev_gid), F.lit(100)) < 25,
                F.pmod(F.xxhash64(ev_gid, F.lit(1)), F.lit(25)),
            )
            .otherwise(F.col("user_id") + F.col("_r").cast("long") * USER_STRIDE)
            .cast("long")
            .alias("user_id")
        )
    write(
        ev.select(
            offset("event_id", STRIDES["events"][1]),
            "ts",
            uid,
            "event_type",
            "value",
            "props",
        ),
        "events",
        p,
    )

    # documents: per-replica letter bijection (rot for r < 26, seeded
    # permutation beyond) via a BROADCAST mapping grid + column-arg
    # translate — one JVM expression regardless of R (a CASE chain
    # stops scaling past a few dozen replicas)
    doc_grid = spark.createDataFrame(
        [(r, letter_maps[r]) for r in range(R)], "_r int, _to string"
    )
    docs = load_table(spark, SRC, "documents").crossJoin(F.broadcast(doc_grid))
    p = max(4, R // 8)
    text_col = F.expr(f"translate(text, '{az}', _to)").alias("text")
    lang_col = F.col("lang")
    nchars_col = F.col("n_chars")
    if args.skew:
        # heavy-tail lengths, keyed on the GLOBAL doc id: 0.1% x40,
        # 0.9% x12, 9% x4, the 90% bulk truncated to 60% — expected
        # char volume ~1.05x the uniform decade (distribution changes,
        # size does not), max doc ~40x the base max. n_chars is
        # re-derived from the final text so the length invariant the
        # text kernels block on stays true.
        doc_gid = offset("doc_id", STRIDES["documents"][1])
        h = F.pmod(F.xxhash64(doc_gid), F.lit(1000))
        t = F.expr(f"translate(text, '{az}', _to)")
        text_expr = (
            F.when(h == 0, F.repeat(t, 40))
            .when(h < 10, F.repeat(t, 12))
            .when(h < 100, F.repeat(t, 4))
            .otherwise(
                F.substring(
                    t, F.lit(1), F.greatest(F.lit(1), F.floor(F.length(t) * 0.6).cast("int"))
                )
            )
        )
        text_col = text_expr.alias("text")
        # hot language: ~70% of docs forced to 'en' (→ ~80% overall)
        lang_col = (
            F.when(F.pmod(F.xxhash64(doc_gid, F.lit(3)), F.lit(100)) < 70, F.lit("en"))
            .otherwise(F.col("lang"))
            .alias("lang")
        )
        nchars_col = F.length(text_expr).cast("long").alias("n_chars")
    write(
        docs.select(
            offset("doc_id", STRIDES["documents"][1]),
            text_col,
            lang_col,
            "source",
            nchars_col,
        ),
        "documents",
        p,
    )

    # embeddings: per-replica orthogonal transform (circular dim shift
    # for r < 64, seeded dim permutation + sign flips beyond) via the
    # same broadcast-grid pattern: output dim i reads source dim
    # _perm[i] times _sign[i] — norm- and intra-replica-distance-
    # preserving for every replica
    emb_grid = spark.createDataFrame(
        [
            (r, [q + 1 for q in perm], signs)
            for r, (perm, signs) in enumerate(emb_transforms)
        ],
        "_r int, _perm array<int>, _sign array<double>",
    )
    emb = load_table(spark, SRC, "embeddings").crossJoin(F.broadcast(emb_grid))
    transformed = F.transform(
        F.sequence(F.lit(1), F.lit(EMB_DIM)),
        lambda i: F.element_at(F.col("embedding"), F.element_at("_perm", i))
        * F.element_at("_sign", i),
    ).cast("array<float>")
    if args.skew:
        # --skew: ~10% of vectors collapse onto the base vec-0
        # DIRECTION (scaled by a tiny per-row factor so values stay
        # distinct) — one hot IVF/LSH cell by construction
        hot_v = (
            load_table(spark, SRC, "embeddings")
            .where(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0][0]
        )
        vec_gid = offset("vec_id", STRIDES["embeddings"][1])
        eps = F.pmod(F.xxhash64(vec_gid, F.lit(9)), F.lit(1000)).cast("double") / F.lit(1e5)
        hot_arr = F.array(*[F.lit(float(x)) for x in hot_v])
        transformed = F.when(
            F.pmod(F.xxhash64(vec_gid), F.lit(100)) < 10,
            F.transform(hot_arr, lambda x: x * (F.lit(1.0) + eps)).cast("array<float>"),
        ).otherwise(transformed)
    write(
        emb.select(
            offset("vec_id", STRIDES["embeddings"][1]),
            transformed.alias("embedding"),
            "label",
        ),
        "embeddings",
        max(2, R // 16),
    )

    print(
        f"wrote {'skewed ' if args.skew else ''}sf{R / 10:g} decade to {out}",
        file=sys.stderr,
    )
    spark.stop()

    # auto-validate in the SAME invocation (round-9 advice): a decade
    # that violates its construction properties must never be written
    # without tripping an error here
    from validate_decade import validate, validate_skew

    if args.skew:
        validate_skew(str(out), R)
    else:
        validate(str(out), R)


if __name__ == "__main__":
    main()
