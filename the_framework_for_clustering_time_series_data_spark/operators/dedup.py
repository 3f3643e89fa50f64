"""Deduplication operators for large-scale training-data pipelines:
exact, n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine near-dup.

Scale design:
  * exact dedup hashes the content (md5) and groups on the hash — the
    shuffle key is 16 bytes regardless of document size;
  * n-gram Jaccard joins only pairs that SHARE a shingle (inverted-index
    join), never the full cross product;
  * MinHash-LSH bands signatures so candidate pairs collide in buckets —
    join cost scales with collisions, not n²;
  * SimHash reduces each doc to one 64-bit int; near-dup = small
    Hamming distance, found via band-exact match on rotations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def stage_checkpoint(df, eager=True):
    """Lazy proxy for functions.plan_tools.stage_checkpoint: this
    module is imported by functions/__init__, so a module-level
    import of the functions package would be circular."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import (
        stage_checkpoint as _sc,
    )

    return _sc(df, eager=eager)




def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → (text_hash, n_dups, keep_id)
    with keep_id = min id (the canonical survivor).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per distinct text (the min-id row)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def _shingles_raw(text_col: str, n: int) -> F.Column:
    """Word n-gram shingles of lowercase text (with repeats).

    Built from SHIFTED-ARRAY zips, not per-position slices: the
    previous ``transform(idx, i -> concat_ws(' ', slice(toks, i+1,
    n)))`` allocated one array copy + string builder PER POSITION
    (~3.3 s per sf0.1 corpus pass); folding ``zip_with(g, slice(toks,
    j, …), concat)`` over j = 2..n does n−1 slices + zips PER ROW —
    identical strings (null-propagating concat marks the tail where a
    shifted array ran out; the filter drops it, which also yields []
    for sub-n-token docs, matching the oracle's WHERE len >= n), 8×
    faster (0.42 s). Speeds every string-shingle consumer
    (ngram-Jaccard family, incremental/containment dedup)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    g = toks
    for j in range(2, n + 1):
        shifted = F.slice(
            toks, j, F.greatest(F.size(toks) - F.lit(j - 1), F.lit(0))
        )
        g = F.zip_with(g, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(g, lambda x: x.isNotNull())


def _shingles(text_col: str, n: int) -> F.Column:
    """Distinct word n-gram shingles of lowercase text."""
    return F.array_distinct(_shingles_raw(text_col, n))


def _hashed_shingles(text_col: str, n: int, family: str = "xxhash64") -> F.Column:
    """Distinct 64-bit hashes of word n-gram shingles, WITHOUT
    materializing shingle strings: hash each token once, then combine
    the n consecutive token hashes position-sensitively with
    shift+xor. ~8× faster than hashing per-position string slices (no
    per-shingle array slice / string concat / string hash), at the
    cost of a composed hash instead of a direct string hash — fine
    wherever any well-mixed injective-whp shingle→long map works
    (MinHash signatures, Jaccard counting).

    ``family``: "xxhash64" (prod, one JVM op per token) or "md5" —
    the portable 60-bit ``conv(substr(md5(tok),1,15),16,10)`` family
    DuckDB reproduces bit-identically, for oracle-checked twins.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if family == "md5":
        th = F.transform(toks, md5_60bit_hash)
    else:
        th = F.transform(toks, lambda t: F.xxhash64(t))

    def combine(th_arr: F.Column):
        def h(i: F.Column) -> F.Column:
            acc = F.shiftleft(F.get(th_arr, i), n - 1)
            for j in range(1, n):
                acc = acc.bitwiseXOR(F.shiftleft(F.get(th_arr, i + j), n - 1 - j))
            return acc

        # same size<n guard as _shingles_raw (sequence would descend)
        idx = F.when(
            F.size(th_arr) >= n, F.sequence(F.lit(0), F.size(th_arr) - F.lit(n))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, h)

    # bind the token-hash array to a lambda variable so it is evaluated
    # ONCE per row — inlining `th` into every F.get() would re-run the
    # whole token-hash transform per shingle position (O(L²) hashing;
    # Catalyst does not CSE across lambda bodies)
    return F.array_distinct(
        F.get(F.transform(F.array(th), combine), 0)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
    shingle_hash: str | None = None,
    max_docs: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity ≥
    threshold.

    Inverted-index plan: explode distinct shingles → self-join on the
    shingle (only co-shingled pairs meet) → per-pair intersection count
    → Jaccard = |∩| / (|A| + |B| - |∩|). The shuffle key is the
    shingle.

    ``max_doc_freq`` (off by default, exact semantics) drops shingles
    occurring in more than that many documents BEFORE the self-join —
    the scale guard for boilerplate shingles, whose bucket contributes
    O(df²) join rows while adding almost no Jaccard discrimination.
    With the cap on, reported Jaccard is computed over the surviving
    (rarer) shingles only, i.e. a slight underestimate for pairs that
    shared hot shingles; denominators still use the FULL shingle
    counts, so capped results never gain false positives.

    ``shingle_hash``: ``None`` joins on shingle STRINGS (exact,
    oracle-literal); ``"xxhash64"`` / ``"md5"`` join on 64-bit shingle
    hashes instead — no shingle strings ever materialize or shuffle
    (the scale form; ``"md5"`` is the portable family a DuckDB oracle
    reproduces bit-identically, see ``_hashed_shingles``).

    ``max_docs`` (off by default) bounds the EXACT form's otherwise
    unbounded Σ df² self-join by restricting it to a deterministic
    document sample: the ``max_docs`` ids with the smallest
    md5(id) (stable across engines and corpus growth — the
    ``ts_pair_correlation`` sampling discipline). Below the cap the
    output is identical to the uncapped form; above it, the pair
    budget is a constant ≤ max_docs²/2 regardless of corpus size.
    Jaccard within the sample is exact.

    ``prefix_filter`` (off by default) applies the PPJoin/AllPairs
    prefix filter (Bayardo et al., WWW'07; Chaudhuri et al.): order
    every document's shingles by a GLOBAL canonical order (ascending
    document frequency, then shingle — rarest first) and index only
    each document's first ``|A| − ⌈t′·|A|⌉ + 1`` shingles in the
    self-join, where ``t′ = t − 5e-7`` (the admission test below is
    ``round(J, 6) ≥ t``, so the bound is sized for the 6-dp-rounded
    admission set, and the ceil carries a −1e-9 epsilon against
    float-product overshoot — both widenings only lengthen the
    prefix). PROVABLY LOSSLESS for the admitted set: if two sets with
    J ≥ t shared no prefix shingle, the smallest shared shingle in the
    global order would force the entire intersection into one
    document's ⌈t·|A|⌉−1 suffix, contradicting |A∩B| ≥ t·|A|. The
    intersection is then computed EXACTLY per candidate pair
    (array_intersect on the full shingle sets), so the output is
    bit-identical to the unfiltered form — only the candidate volume
    changes: rare-first prefixes shrink the inverted-index join from
    Σ df² over all shingles to Σ df² over prefix occurrences of the
    RAREST shingles (boilerplate never enters the index). Composes
    with the other knobs; mutually exclusive with ``max_doc_freq``
    (the capped twin changes semantics instead of candidates).

    WHEN to turn it on: Zipfian corpora, where most shingles are rare
    and prefixes prune hard. The synthetic test table is the
    anti-case — a ~25-word vocabulary makes every trigram frequent, so
    the filter prunes little while paying two extra shuffles (df join
    + per-doc canonical sort): measured 3.8 s plain vs 5.2 s filtered
    at sf0.1 — which is why the registered query leaves it off.
    Losslessness is locked by tests/test_plans.py::
    test_prefix_filter_jaccard_lossless either way.
    """
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import ensure_min_parallelism

    sh_col = (
        _shingles(text_col, n)
        if shingle_hash is None
        else _hashed_shingles(text_col, n, family=shingle_hash)
    )
    base = ensure_min_parallelism(df)
    if max_docs is not None:
        keep = (
            base.select(F.col(id_col))
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(max_docs)
        )
        base = base.join(F.broadcast(keep), id_col, "left_semi")
    if prefix_filter and max_doc_freq is not None:
        raise ValueError("prefix_filter composes with exact semantics only; "
                         "max_doc_freq already bounds the capped twin")
    docs = base.select(
        F.col(id_col).alias("id"), sh_col.alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    if prefix_filter:
        # lossless PPJoin candidate generation (see docstring): index
        # each doc's |A| - ceil(t|A|) + 1 rarest shingles only, then
        # verify candidates EXACTLY on the full shingle sets
        ex_all = docs.select("id", F.explode("sh").alias("shingle"))
        dfreq = ex_all.groupBy("shingle").agg(F.count("*").alias("_df"))
        ordered = (
            ex_all.join(dfreq, "shingle")
            .groupBy("id")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("_df", "shingle"))
                    ),
                    lambda st: st.shingle,
                ).alias("_ordered")
            )
        )
        # prefix length: a - ceil(t'*a) + 1 (>= 1 whenever a >= 1), with
        # TWO conservative widenings so the bound covers exactly what the
        # final filter admits: (1) the admission test is round(J,6) >= t,
        # so pairs with true J in [t - 5e-7, t) pass — the prefix must
        # therefore be sized for t' = t - 5e-7, not t; (2) ceil over a
        # float product can overshoot an exact integer (0.55*100 =
        # 55.000000000000007 → ceil 56, prefix one element short) — the
        # -1e-9 epsilon guards the float-integer boundary. Both widenings
        # only ever LENGTHEN the prefix (more candidates, never fewer),
        # so losslessness is preserved by construction.
        plen = (
            F.size("_ordered")
            - F.ceil(
                F.size("_ordered") * F.lit(float(threshold) - 5e-7) - F.lit(1e-9)
            ).cast("int")
            + 1
        )
        pex = ordered.select(
            "id", F.explode(F.slice("_ordered", 1, plen)).alias("shingle")
        )
        a, b = pex.alias("a"), pex.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        da = docs.select(F.col("id").alias("id_a"), F.col("sh").alias("_sh_a"),
                         F.col("n_sh").alias("n_a"))
        db = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("_sh_b"),
                         F.col("n_sh").alias("n_b"))
        # merge-hint the shingle-array dimension joins: the payload
        # sides scale with the corpus and the candidate side is NOT
        # tiny, so AQE can pick the array side to broadcast — which
        # OOMs the driver a decade up (the dedup_containment sf10
        # find; arrays inflate far beyond their on-disk estimate)
        inter = (
            cand.join(da.hint("merge"), "id_a")
            .join(db.hint("merge"), "id_b")
            .withColumn("n_inter", F.size(F.array_intersect("_sh_a", "_sh_b")))
            .select("id_a", "id_b", "n_a", "n_b", "n_inter")
        )
    else:
        ex = docs.select("id", "n_sh", F.explode("sh").alias("shingle"))
        if max_doc_freq is not None:
            # the postings feed BOTH the doc-frequency aggregate and
            # the anti-join input — checkpoint so tokenize + shingle +
            # hash + explode run once, not twice (guide §2.4; the
            # reliable-checkpoint conf covers the cluster form)
            ex = ex.transform(stage_checkpoint, eager=False)
            hot = (
                ex.groupBy("shingle")
                .agg(F.count("*").alias("_df"))
                .where(F.col("_df") > max_doc_freq)
                .select("shingle")
            )
            ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
        a, b = ex.alias("a"), ex.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.n_sh").alias("n_a"),
                F.col("b.n_sh").alias("n_b"),
            )
            .agg(F.count("*").alias("n_inter"))
        )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def md5_60bit_hash(col) -> F.Column:
    """The portable 60-bit token-hash family shared by every
    oracle-checked dedup twin: ``conv(substr(md5(x),1,15),16,10)``,
    reproduced bit-identically in DuckDB as
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``. ONE
    definition — the minhash/simhash/jaccard oracles all depend on
    these two expressions staying in lockstep."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_xor_family(num_hashes: int) -> list[int]:
    """The seeded XOR-permutation constants shared by the Spark
    operator and the DuckDB oracle twin (plans/dedup_plans.py) — both
    sides must draw the identical family for value parity."""
    import numpy as np

    rng = np.random.default_rng(42)
    return [int(x) for x in rng.integers(0, 2**63, num_hashes, dtype=np.int64)]


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding,
    verified with exact Jaccard on the candidates.

    ``materialize=False`` skips the two eager localCheckpoints (the
    candidate pairs and their shingle sets) so the full logical plan
    stays inspectable — used by the plan-shape tests; production keeps
    the default, which pins both candidate-sized frames exactly once.

    Pipeline (all DataFrame ops, deterministic):
      1. tokenize → posexplode tokens → ONE codegen'd xxhash64 per
         token row → n-gram shingle hashes by shift-xor composition of
         ``lead()`` neighbor hashes (no shingle strings ever
         materialize — every later step runs on 64-bit longs); the
         ``num_hashes`` family members are XOR permutations h ⊕ r_i;
      2. per doc: ONE groupBy(id) computing all num_hashes min(sh ⊕ r_i)
         aggregates — the minhash signature. The groupBy sits on the
         window's hash partitioning by id, so the signature stage is a
         single shuffle and every expression runs in whole-stage
         codegen. (Two rejected designs: folding 64 array_min/transform
         HOFs over a shingle array — HOF lambdas evaluate INTERPRETED
         at ~6 µs/element, 4-5× slower; and collect_set-ing every doc's
         shingle set alongside the signature and caching it — O(corpus
         tokens) executor memory, the verify pass below re-derives sets
         for candidates only instead.);
      3. band the signature (num_hashes/band_size bands), hash each
         band, groupBy (band_id, band_hash) bucket → generate pairs
         WITHIN each bucket (sorted collect_list + combination explode)
         — one aggregation, no self-join, signature computed once;
      4. Jaccard on the candidate pairs only, as intersection of the
         hashed-shingle sets (collision odds ~2^-64·|A|·|B| — exact in
         practice, and long equality beats string equality).

    Scale: candidate generation is linear in n_docs × num_hashes plus
    Σ bucket_size² over colliding buckets; a hot bucket (boilerplate
    docs) is capped at ``max_bucket`` to bound the quadratic term.
    Docs with fewer than ``n`` tokens have no shingles and drop out
    (they cannot be near-duplicates under n-gram Jaccard).

    ``hash_family``: ``"xxhash64"`` (default, prod — one codegen'd JVM
    op per token) or ``"md5"`` — a portable 60-bit family
    (``conv(substring(md5(tok),1,15),16,10)``) that DuckDB computes
    bit-identically (``('0x' || substr(md5(tok),1,15))::BIGINT``), so
    the registered query gets a full value-hash oracle instead of a
    rows-only check. The md5 family also swaps the band-bucket key
    from xxhash64-of-band to the raw signature tuple, keeping every
    step reproducible cross-engine.
    """
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import ensure_min_parallelism

    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family {hash_family!r}")

    df = ensure_min_parallelism(df)
    band_size = 4
    n_bands = num_hashes // band_size
    max_bucket = 1000
    # XOR family: h ⊕ r_i is a bijection of the hash space and NOT
    # monotonic in h, so each family member has its own argmin shingle
    # (a monotonic transform like a·h+b without a modulus would make
    # all 64 minhashes pick the same shingle and collapse the LSH to a
    # single estimator). One bitwise op per element — cheaper than the
    # classical (a·h+b) mod P family; weaker theoretical min-wise
    # independence, measured recall 1.0 vs exact Jaccard at θ=0.5 on
    # the documents table.
    rs = minhash_xor_family(num_hashes)
    if hash_family == "md5":
        tok_hash = md5_60bit_hash("tok")
    else:
        tok_hash = F.xxhash64("tok")

    def shingle(d: DataFrame) -> DataFrame:
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ex = d.select(
            F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok")
        ).select("id", "pos", tok_hash.alias("h"))
        w = Window.partitionBy("id").orderBy("pos")
        neighbors = [F.col("h")] + [F.lead("h", j).over(w) for j in range(1, n)]
        with_nb = ex.select(
            "id", *[nb.alias(f"h{j}") for j, nb in enumerate(neighbors)]
        )
        sh_hash = F.shiftleft(F.col("h0"), n - 1)
        for j in range(1, n):
            sh_hash = sh_hash.bitwiseXOR(F.shiftleft(F.col(f"h{j}"), n - 1 - j))
        return with_nb.where(F.col(f"h{n - 1}").isNotNull()).select(
            "id", sh_hash.alias("sh")
        )

    # Pass 1 over the corpus: ONLY the 64-long minhash signature per doc
    # — no shingle-set arrays materialize for the full corpus (caching
    # per-doc collect_set arrays is O(corpus tokens) memory and the GC
    # hazard that made this stage jittery; at fleet scale it's simply
    # impossible, so the design is: signatures for everyone, shingle
    # sets only for candidates in pass 2).
    sig = shingle(df).groupBy("id").agg(
        F.array(*[F.min(F.col("sh").bitwiseXOR(F.lit(r))) for r in rs]).alias("sig"),
    )
    def band_key(b):
        elems = [F.element_at("sig", b * band_size + j + 1) for j in range(band_size)]
        if hash_family == "md5":
            # portable: the raw signature tuple IS the bucket key — no
            # engine-specific band hash between Spark and the oracle
            return F.struct(*[e.alias(f"e{j}") for j, e in enumerate(elems)])
        return F.xxhash64(*elems)

    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        band_key(b).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band_id", "bb.band_hash")
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    # all (a < b) combinations within a bucket, generated array-side
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    # cand is used twice below (id set + final join) and is tiny —
    # materialize IT (localCheckpoint, released with the plan when the
    # result is dropped) rather than .cache(), which would pin a
    # cache-manager entry per call for the session's lifetime.
    cand = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    if materialize:
        cand = cand.transform(stage_checkpoint, eager=True)
    # Pass 2: exact shingle sets for CANDIDATE docs only. The broadcast
    # semi-join prunes the corpus BEFORE tokenization, so this pass is
    # linear in the candidate count, not the corpus.
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    df_cand = df.join(F.broadcast(cand_ids), id_col, "left_semi")
    # materialized once (candidate-sized): the verify join consumes sh
    # TWICE (as sh_a and sh_b) and without a checkpoint each side
    # re-tokenizes the candidate docs — the load-sensitive recompute
    # behind the round-2 run-to-run spread.
    sh = (
        shingle(df_cand)
        .groupBy("id")
        .agg(F.collect_set("sh").alias("hs"))
        .withColumn("n_sh", F.size("hs"))
    )
    if materialize:
        sh = sh.transform(stage_checkpoint, eager=True)
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("hs").alias("sh_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("hs").alias("sh_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprint per document over lowercase word tokens.

    Per token, a hash; per bit position, sum of ±1 across tokens;
    fingerprint bit b = 1 iff the sum > 0. Computed as a single grouped
    aggregate over exploded (token, bit) pairs — no Python, no per-row
    loops.

    ``hash_family``: "xxhash64" (prod default, 64 bits) or "md5" — the
    portable 60-bit family DuckDB reproduces bit-identically (pass
    ``bits=60`` with it), giving the registered query a full value-hash
    oracle; see minhash_lsh_pairs for the family definition.
    """
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import ensure_min_parallelism

    if hash_family == "md5":
        tok_hash = md5_60bit_hash("tok")
    else:
        tok_hash = F.xxhash64("tok")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ex = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    ).withColumn("h", tok_hash)
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    votes = ex.groupBy("id").agg(*bit_votes)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long") if b < 63 else F.when(F.col(f"b{b}") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return votes.select("id", fp.alias("simhash"))


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
    max_corpus_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold).

    Brute-force O(n²) pairwise — the correct baseline; at scale use
    LSH bucketing (similarity.ann_lsh) to prune candidates first.

    Physical strategy (``vectorized``, default): the corpus matrix is
    small by this operator's contract (brute force is only ever run on
    a bounded corpus), so it broadcasts L2-normalized to every
    executor and each Arrow batch scores ITSELF against the whole
    corpus with one BLAS matmul, emitting only above-threshold pairs
    with the id_a < id_b dedup applied in NumPy — the same
    broadcast-matmul shape as similarity.brute_force_topk's scoring
    pass. The interpreted-HOF self-join fallback
    (``vectorized=False``) keeps a no-Python path; it is ~40× slower
    at 5k×64 because every pair pays an interpreted zip_with fold
    rather than amortizing into a matrix multiply.
    """
    if not vectorized:
        from the_framework_for_clustering_time_series_data_spark.operators.similarity import cosine_expr

        v = emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        a, b = v.alias("a"), v.alias("b")
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )

    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.corpus_guard import (
        id_spark_type,
        require_bounded_corpus,
    )

    require_bounded_corpus(
        emb,
        op="embedding_cosine_pairs",
        scale_route="similarity.ann_lsh_topk / semantic_dedup (cell-bounded)",
        limit=max_corpus_rows,
    )
    id_t = id_spark_type(emb, id_col)

    v = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    rows = v.collect()
    # id dtype follows the input column (string series ids stay strings)
    ids = np.array([r["id"] for r in rows])
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat))

    def score(batches):
        all_ids, all_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            bids = pdf["id"].to_numpy()
            bm = np.array(pdf["v"].tolist(), dtype=np.float64)
            bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
            sims = np.round(bm @ all_mat.T, 6)
            ri, ci = np.nonzero(
                (sims >= threshold) & (all_ids[None, :] > bids[:, None])
            )
            if len(ri):
                yield pd.DataFrame(
                    {
                        "id_a": bids[ri],
                        "id_b": all_ids[ci],
                        "cosine": sims[ri, ci],
                    }
                )

    return v.mapInPandas(score, f"id_a {id_t}, id_b {id_t}, cosine double")


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash near-duplicate pairs: Hamming(simhash_a, simhash_b) ≤
    ``max_hamming``.

    Pigeonhole banding: the fingerprint splits into ``max_hamming + 1``
    contiguous bands COVERING all bits (sizes differ by at most one
    bit); a pair within Hamming distance ``max_hamming`` has fewer
    differing bits than bands, so it agrees EXACTLY on at least one —
    candidates = same-(band, value) bucket pairs (one groupBy — same
    shape as the MinHash banding), then exact verification via
    bit_count(xor). Never an O(n²) comparison. (A fixed 4-band split
    would silently drop pairs when max_hamming > 3.)
    """
    n_bands = max_hamming + 1
    base, extra = divmod(bits, n_bands)
    offsets, widths, off = [], [], 0
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        offsets.append(off)
        widths.append(w)
        off += w
    fp = simhash(df, text_col=text_col, id_col=id_col, bits=bits, hash_family=hash_family)
    bands = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("simhash"), offsets[b])
                        .bitwiseAND(F.lit((1 << widths[b]) - 1))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.band_id", "bb.band_val")
    buckets = (
        bands.groupBy("band_id", "band_val")
        .agg(F.sort_array(F.collect_list(F.struct("id", "simhash"))).alias("ms"))
        .where((F.size("ms") > 1) & (F.size("ms") <= 1000))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["simhash"].alias("ha"),
                    y["simhash"].alias("hb"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b", F.bit_count(F.col("p.ha").bitwiseXOR(F.col("p.hb"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    small_graph_threshold: int = 200_000,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list by two-phase
    alternating star contraction (Kiveris et al. 2014): every node ends
    up labeled with the minimum node id reachable from it. Returns
    (node, component); ``stats`` (optional dict) receives the round
    count under ``"rounds"``.

    Each round is a large-star + small-star pair — one grouped min and
    one same-key equi-join each. Convergence is O(log n) rounds even on
    adversarial chain-shaped graphs (containment chains a⊂b⊂c⊂…, where
    plain min-label propagation needs O(diameter) rounds): each
    large-star at least halves every path. ``localCheckpoint`` per
    round keeps the plan flat instead of growing the lineage
    exponentially (same pattern as the DBSCAN component search,
    cluster.py).

    Adaptive fast path: when the (deduplicated) edge list is at most
    ``small_graph_threshold`` rows, the component search runs as
    driver-side union-find on the collected edges — microseconds of
    CPU over a few MB — instead of paying J Spark jobs of fixed
    scheduling overhead for a loop whose data fits in one hand. This
    is the same runtime-adaptive reasoning AQE applies to join
    strategies; the distributed loop below is the ≥-threshold path
    and the two are equivalent by construction (tests cover both by
    crossing the threshold).
    """
    bi = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .union(edges.select(F.col(dst).alias("e_src"), F.col(src).alias("e_dst")))
        .distinct()
        .transform(stage_checkpoint, eager=True)
    )
    n_edges = bi.count()
    if n_edges <= small_graph_threshold:
        rows = bi.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            a, b = r["e_src"], r["e_dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id keeps the min-label convention
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(n, find(n)) for n in parent]
        # id type follows the input (long for doc/vec ids, string for
        # sliding-window synthetic series ids)
        idt = edges.schema[src].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            out, f"node {idt}, component {idt}"
        )
    # Two-phase star contraction (Kiveris et al., "Connected Components
    # in MapReduce and Beyond"): alternate large-star / small-star until
    # the edge set is a fixed point — a star per component rooted at its
    # minimum id. Converges in O(log n) rounds in practice (each
    # large-star at least halves path lengths), vs the O(diameter)
    # rounds of plain min-label propagation, which degrades on
    # chain-shaped duplicate clusters (containment chains a⊂b⊂c⊂…).
    # Edges stay oriented (u > v) between phases; every step is one
    # grouped min + one equi-join on the SAME key, so the join reuses
    # the aggregate's partitioning.
    E = (
        bi.where(F.col("e_src") > F.col("e_dst"))
        .select(F.col("e_src").alias("u"), F.col("e_dst").alias("v"))
        .transform(stage_checkpoint, eager=True)
    )

    def _signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"),
            # decimal accumulator: ANSI mode forbids long-sum overflow
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _signature(E)
    rounds = 0
    for _ in range(max_iter):
        # large-star: over the symmetric view, attach every neighbor
        # v > u to m(u) = min(Γ(u) ∪ {u}); output stays (hi, lo)
        sym = E.select("u", "v").union(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m_lg = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        lg = (
            sym.where(F.col("v") > F.col("u"))
            .join(m_lg, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: all strictly-smaller neighbors (and u itself)
        # attach to the minimum neighbor
        m_sm = lg.groupBy("u").agg(F.min("v").alias("m"))
        sm = (
            lg.join(m_sm, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m_sm.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .transform(stage_checkpoint, eager=True)
        )
        rounds += 1
        new_sig = _signature(sm)
        E = sm
        if new_sig == sig:
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds
    # fixed point: E = {(node, root)} per component; roots appear only
    # as destinations and label themselves
    return E.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        E.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    )


def duplicate_groups(pairs: DataFrame) -> DataFrame:
    """Near-duplicate GROUPS from a pair list: transitive closure of
    the pairs, one group per component, group id = min doc id in the
    group (the canonical survivor a dedup pipeline keeps). Returns
    (doc_id, group_id, group_size) for every doc in some group.
    """
    comp = connected_components(pairs)
    w = Window.partitionBy("group_id")
    return (
        comp.select(F.col("node").alias("doc_id"), F.col("component").alias("group_id"))
        .withColumn("group_size", F.count("*").over(w))
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    threshold: float = 0.9,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): k-means partitions the embedding space into
    cells, pairwise cosine runs only WITHIN a cell (bounding the
    quadratic pair scan to ~ (n/k)^2 per cell instead of n^2), near-dup
    pairs are closed transitively, and each duplicate group keeps the
    single member CLOSEST to its cell centroid (the best exemplar of
    the local mode).

    Returns one row per input vector:
    (id, cell, group_id, group_size, keep) — singletons keep
    themselves with group_size 1. Cross-cell duplicates are missed by
    construction; that is the accepted recall trade the paper makes to
    scale past brute force.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("_features", array_to_vector("v"))
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="_features", predictionCol="cell"
    ).fit(vecs)
    pred = model.transform(vecs).drop("_features").transform(stage_checkpoint, eager=True)

    # within-cell pair scan as ONE matmul per cell (applyInPandas on
    # the cell key) — the interpreted per-pair cosine fold this
    # replaces was ~20× slower at 5k×64 (same lesson as
    # embedding_cosine_pairs' vectorized path)
    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.corpus_guard import id_spark_type

    id_t = id_spark_type(emb, id_col)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # id dtype follows the input column (string ids stay strings)
        ids = pdf["id"].to_numpy()
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        ri, ci = np.nonzero((sims >= threshold) & (ids[None, :] > ids[:, None]))
        return pd.DataFrame({"id_a": ids[ri], "id_b": ids[ci]})

    pairs = (
        pred.select("cell", "id", "v")
        .groupBy("cell")
        .applyInPandas(cell_pairs, f"id_a {id_t}, id_b {id_t}")
    )
    groups = duplicate_groups(pairs)  # (doc_id, group_id, group_size)

    centers = model.clusterCenters()
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)], "cell int, cvec array<double>"
    )
    # distance to own-cell centroid decides the group representative
    with_d = pred.join(F.broadcast(cdf), "cell").select(
        "id",
        "cell",
        F.aggregate(
            F.zip_with("v", "cvec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d2"),
    )
    member = with_d.join(
        groups.select(F.col("doc_id").alias("id"), "group_id", "group_size"),
        "id",
        "left",
    ).select(
        "id",
        "cell",
        F.coalesce("group_id", "id").alias("group_id"),
        F.coalesce("group_size", F.lit(1)).alias("group_size"),
        "d2",
    )
    w = Window.partitionBy("group_id").orderBy("d2", "id")
    return member.select(
        "id",
        "cell",
        "group_id",
        "group_size",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def semantic_dedup_deterministic(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    threshold: float = 0.9,
    lloyd_rounds: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) with a DETERMINISTIC,
    cross-engine-replayable cell assignment — the oracle-checkable twin
    of :func:`semantic_dedup` (whose MLlib k-means seeding is
    RNG-/implementation-defined and therefore rows-only at the gate).

    Cells come from ``lloyd_rounds`` fixed Lloyd assignment rounds
    seeded by the ``n_cells`` vectors with the smallest md5(id) (the
    engine's standard deterministic-sample family), expressed entirely
    as DataFrame ops. Parity disciplines making a DuckDB twin
    value-identical:

    * assignment distances are SEQUENTIAL left-to-right folds over the
      array (``zip_with``+``aggregate`` ↔ DuckDB
      ``list_transform``+``list_aggregate``) — bit-identical given
      identical inputs;
    * updated centroid components round half-up to 6 dp with the
      engine-agnostic ``floor(x*1e6 + 0.5)/1e6`` form in BOTH engines,
      absorbing the mean's partial-aggregation association drift;
    * the pair-stage cosine runs as one BLAS matmul per cell (speed)
      but its threshold DECISION keys on the same half-up-6dp round in
      both engines, so matmul-vs-fold ulp drift cannot flip a pair;
    * argmin assignment keys on (d2, cell); the survivor pick on
      (d2-to-own-centroid, id) — all deterministic ties.

    Output matches semantic_dedup: one row per vector,
    ``(id, cell, group_id, group_size, keep)``.

    Scale shape: centroids are a broadcast ≤ n_cells×dim literal-sized
    frame; each round is one scan + per-id argmin (no shuffle of the
    vectors beyond the first exchange); the pair scan is bounded per
    cell exactly as the paper intends. The Lloyd round count is FIXED
    (not convergence-driven) — determinism over optimality, which is
    fine for cell BOUNDING where any reasonable partition works.
    """
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import deterministic_lloyd_assign

    final = deterministic_lloyd_assign(
        emb, n_cells, id_col=id_col, vec_col=vec_col, lloyd_rounds=lloyd_rounds
    ).transform(stage_checkpoint, eager=True)

    # pair scan as ONE matmul per cell (the semantic_dedup lesson: an
    # interpreted zip_with/aggregate HOF per pair costs ~µs per ELEMENT
    # — |pairs|·dim elements — measured 9.9 s vs ~2 s at sf0.1). The
    # cosine DECISION keys on the half-up-6dp round in BOTH engines, so
    # BLAS-vs-sequential-fold ulp drift cannot flip a pair across the
    # threshold.
    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.corpus_guard import id_spark_type

    id_t = id_spark_type(emb, id_col)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        sims = (mat @ mat.T) / np.outer(norms, norms)
        simsr = np.floor(sims * 1e6 + 0.5) / 1e6
        ri, ci = np.nonzero((simsr >= threshold) & (ids[None, :] > ids[:, None]))
        # condition (r, c) reads ids[c] > ids[r] → id_a is the row id
        return pd.DataFrame({"id_a": ids[ri], "id_b": ids[ci]})

    pairs = (
        final.select("cell", "id", "v")
        .groupBy("cell")
        .applyInPandas(cell_pairs, f"id_a {id_t}, id_b {id_t}")
    )
    return _semantic_close_groups(final, pairs)


def _semantic_close_groups(final: DataFrame, pairs: DataFrame) -> DataFrame:
    """The shared SemDeDup tail: transitive closure of the in-cell
    near-dup pairs, group sizes, and the centroid-closest survivor pick
    on the deterministic (d2, id) key. ``final`` carries one row per
    vector ``(id, cell, d2)``(+extras); ``pairs`` the thresholded
    ``(id_a, id_b)`` edges."""
    comp = connected_components(pairs)  # (node, component) — min-id label
    gsz = comp.groupBy("component").agg(F.count("*").alias("group_size"))
    mem = (
        final.join(comp.withColumnRenamed("node", "id"), "id", "left")
        .withColumn("group_id", F.coalesce("component", "id"))
        .join(gsz.withColumnRenamed("component", "group_id"), "group_id", "left")
        .withColumn("group_size", F.coalesce("group_size", F.lit(1).cast("long")))
    )
    w_keep = Window.partitionBy("group_id").orderBy("d2", "id")
    return mem.select(
        "id",
        "cell",
        "group_id",
        "group_size",
        (F.row_number().over(w_keep) == 1).alias("keep"),
    )


def _micro_mat(series, dim: int):
    """Arrow list<int64> Series → n×dim int64 matrix. np.stack is
    C-speed where .tolist() pays a Python object per element (measured
    ~2 s per 200k×64 pass)."""
    import numpy as np

    vals = series.to_numpy()
    return (
        np.stack(vals).astype(np.int64, copy=False)
        if len(vals)
        else np.empty((0, dim), dtype=np.int64)
    )


def _f64_exact_ok(dim: int, *mats) -> bool:
    """fp64 BLAS is EXACT for micro-unit integer kernels while every
    product/partial sum stays below 2^53: the 4 covers the combined
    d2 = ||x||² − 2·x·c + ||c||², whose magnitude reaches
    (|x|+|c|)²·dim ≤ 4·m²·dim. Inside the bound, dgemm returns the
    same integers the int64 einsum would — ~10-20× faster."""
    import numpy as np

    m = max(float(np.abs(a).max(initial=0.0)) for a in mats)
    return 4.0 * m * m * dim < float(2**53)


def _int64_exact_or_raise(dim: int, *mats) -> None:
    """The int64 fallback has its own exactness ceiling (round-11
    advice): past 4·m²·dim ≥ 2^63 (micro components beyond
    ~±sqrt(2^63/(4·dim)), i.e. raw values past ~±190 at dim 64) numpy
    int64 WRAPS silently while the DuckDB BIGINT twin errors — the
    bit-for-bit contract would break exactly where the f64 guard hands
    off. Refuse loudly instead."""
    import numpy as np

    m = max(float(np.abs(a).max(initial=0.0)) for a in mats)
    if 4.0 * m * m * dim >= float(2**63):
        bound = (float(2**63) / (4.0 * max(dim, 1))) ** 0.5
        raise ValueError(
            f"semantic dedup int kernel: micro-unit magnitude {m:.3g} "
            f"exceeds the int64-exact bound {bound:.3g} for dim={dim} — "
            "the integer kernel would overflow silently; rescale the "
            "embeddings (raw components must stay within "
            f"~±{bound / 1e6:.0f})"
        )


def _int_d2_matrix(X, C, dim: int):
    """D2 = ||x||² − 2·X·Cᵀ + ||c||² over int64 micro-unit rows —
    exact integers either path (f64 BLAS inside the 2^53 bound, int64
    einsum inside the 2^63 bound, loud refusal past that)."""
    import numpy as np

    if _f64_exact_ok(dim, X, C):
        Xf, Cf = X.astype(np.float64), C.astype(np.float64)
        return (
            np.einsum("ij,ij->i", Xf, Xf)[:, None]
            - 2 * (Xf @ Cf.T)
            + np.einsum("ij,ij->i", Cf, Cf)[None, :]
        )
    _int64_exact_or_raise(dim, X, C)
    return (
        np.einsum("ij,ij->i", X, X)[:, None]
        - 2 * (X @ C.T)
        + np.einsum("ij,ij->i", C, C)[None, :]
    )


def _int_cell_groups_fn(dim: int, threshold: float):
    """The shared int-exact SemDeDup per-cell tail (used by
    :func:`semantic_dedup_prod` and :func:`semantic_dedup_coarse`):
    in-cell cosine pairs over micro-unit int64 vectors (half-up-6dp
    decision), LOCAL union-find closure, group sizes, and the
    centroid-closest (d2, id) survivor — the dup graph's edges are
    in-cell by construction, so the whole closure runs inside one
    applyInPandas group instead of a distributed star-contraction
    pass (~11.6 s of the sf10 profile before round 11)."""
    import numpy as np
    import pandas as pd

    def cell_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        d2 = pdf["d2"].to_numpy()
        mat = _micro_mat(pdf["v"], dim)
        if _f64_exact_ok(dim, mat):  # fp64 dgemm returns exact integers
            mf = mat.astype(np.float64)
            dots = mf @ mf.T
            norms = np.sqrt(np.einsum("ij,ij->i", mf, mf))
        else:
            _int64_exact_or_raise(dim, mat)
            dots = (mat @ mat.T).astype(np.float64)
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat).astype(np.float64))
        # denominator as sqrt(n2a)·sqrt(n2b) — the oracle's exact op
        # chain — NOT sqrt(n2a·n2b), whose single sqrt rounds differently
        sims = dots / np.outer(norms, norms)
        simsr = np.floor(sims * 1e6 + 0.5) / 1e6
        ri, ci = np.nonzero(
            (simsr >= threshold) & (ids[None, :] > ids[:, None])
        )
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ri, ci):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra
        roots = np.array([find(int(i)) for i in range(len(ids))])
        out_gid = np.empty(len(ids), dtype=ids.dtype)
        out_size = np.empty(len(ids), dtype=np.int64)
        keep = np.zeros(len(ids), dtype=bool)
        for r in np.unique(roots):
            m = roots == r
            out_gid[m] = ids[m].min()
            out_size[m] = int(m.sum())
            # survivor = centroid-closest, ties to the lower id — the
            # (d2, id) argmin the fixed-k twin's window applies
            idxs = np.nonzero(m)[0]
            best = idxs[np.lexsort((ids[idxs], d2[idxs]))[0]]
            keep[best] = True
        return pd.DataFrame(
            {
                "id": ids,
                "cell": pdf["cell"].to_numpy(),
                "group_id": out_gid,
                "group_size": out_size,
                "keep": keep,
            }
        )

    return cell_groups


def semantic_dedup_prod(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_size: int = 250,
    threshold: float = 0.9,
    lloyd_rounds: int = 2,
) -> DataFrame:
    """SemDeDup's PRODUCTION sizing (Abbas et al. 2023 §3: the cluster
    count scales with the corpus): ``k = ceil(n / target_cell_size)``
    derived from one corpus count, so in-cell pair volume stays
    ``n · target/2`` — LINEAR in n — where the fixed-k forms
    (:func:`semantic_dedup_deterministic` via dedup_semantic_scaled)
    are n²/k. The round-10 decade measured that fixed-k cost at 12.02×
    over a 10× corpus growth; this form is the linear registered
    sibling.

    Exactness discipline (STRONGER than the fixed-k twin's accepted
    float caveats): vectors are quantized ONCE to integer micro-units
    (``floor(x·1e6 + 0.5)`` as int64 — both engines compute the same
    fp64 product and floor, so the ints are identical), and every
    distance/dot is integer arithmetic from there:

    * assignment d2 = Σ(x−c)² over int64 — EXACT in any summation
      order, so the Spark-side matmul argmin and the DuckDB sequential
      fold agree bit-for-bit (no association-order caveat at all);
      ties (equal int d2) break to the lower cell in both engines;
    * centroid update = floor(sum(micro)/cnt + 0.5) — int sum is
      order-free, the single fp64 divide+round is the same op in both
      engines (the exact_mean discipline);
    * pair cosine: int64 dot (exact) / (sqrt(int n2a)·sqrt(int n2b))
      — one fp64 sqrt+mul+div chain, identical in both engines — with
      the half-up-6dp decision round on top;
    * survivor pick keys on (int d2, id) — deterministic.

    Scale shape: the per-round centroid table is ``k = n/target`` rows
    (metadata by construction — a 250× reduction; 64-dim int64
    centroids stay under a 100 MB broadcast up to ~50 M vectors, past
    which raise ``target_cell_size`` or route assignment through a
    coarse IVF level), assignment is one Arrow-batched int64 matmul
    argmin per partition (n·k·dim flops, the cost the SemDeDup paper
    pays in faiss), the centroid update aggregates map-side to
    k·dim rows, and the pair scan is one int64 matmul per cell over
    ~target-sized groups. No shuffle carries more than the (id, v,
    cell) frame itself.

    Output schema matches the siblings: one row per vector,
    ``(id, cell, group_id, group_size, keep)``."""
    import math

    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.corpus_guard import id_spark_type

    id_t = id_spark_type(emb, id_col)
    v0 = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("v"),
    ).transform(stage_checkpoint, eager=False)
    # one job for both scalars (guide §1 — don't pay two action
    # barriers for metadata one scan yields): n and dim together;
    # F.first is order-arbitrary but dim is constant across rows
    nd = v0.agg(F.count("*").alias("n"), F.first("v").alias("v1")).head()
    n = nd["n"]
    k = max(1, math.ceil(n / target_cell_size))
    dim = len(nd["v1"]) if nd["v1"] is not None else 0

    seeds = (
        v0.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(k)
        .collect()
    )
    cell_ids = np.arange(k, dtype=np.int64)  # cell = rank in seed order
    cent = np.array([r["v"] for r in seeds], dtype=np.int64)  # k×dim

    sp = emb.sparkSession

    # distance kernels: the shared int-exact module helpers
    # (_micro_mat / _int_d2_matrix) — fp64 BLAS inside the 2^53
    # bound, int64 einsum inside the 2^63 bound, loud refusal past

    def _assign(ids_arr: np.ndarray, cmat: np.ndarray):
        # returns (frame, broadcast handle): each call ships a fresh
        # k×dim centroid broadcast (up to ~100 MB at the documented
        # 50M-vector ceiling) — callers unpersist it once the stage
        # that consumed it has materialized, or multi-round Lloyd runs
        # accumulate dead broadcast blocks for the life of the job
        # (round-11 advice)
        bc = sp.sparkContext.broadcast((ids_arr, cmat))

        def kernel(batches):
            labels, C = bc.value  # cells sorted ascending, k×dim int64
            for pdf in batches:
                X = _micro_mat(pdf["v"], dim)
                # np.argmin takes the FIRST min, and rows are sorted by
                # cell, so an (exact-int) tie goes to the lowest cell —
                # the oracle's ORDER BY d2, cell
                d2 = _int_d2_matrix(X, C, dim)
                rows = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "v": pdf["v"],
                        "cell": labels[rows].astype(np.int32),
                        "d2": d2[np.arange(len(rows)), rows].astype(np.int64),
                    }
                )

        return (
            v0.mapInPandas(kernel, f"id {id_t}, v array<long>, cell int, d2 long"),
            bc,
        )

    def _partial_sums(ids_arr: np.ndarray, cmat: np.ndarray):
        # the Lloyd-round kernel: assign the batch AND reduce it to
        # per-cell (sum vector, count) partials — k×dim per batch
        # instead of the full corpus round-tripping v through Arrow and
        # a 64-way posexplode (the sf10 profile's two dominant costs).
        # Integer partial sums are order-free, so the final mean is the
        # exact quantity the oracle's avg-over-members computes.
        bc = sp.sparkContext.broadcast((ids_arr, cmat))

        def kernel(batches):
            labels, C = bc.value
            for pdf in batches:
                X = _micro_mat(pdf["v"], dim)
                rows = np.argmin(_int_d2_matrix(X, C, dim), axis=1)
                present = np.unique(rows)
                sums = np.zeros((len(present), X.shape[1]), dtype=np.int64)
                cnts = np.zeros(len(present), dtype=np.int64)
                for i, r in enumerate(present):
                    m = rows == r
                    sums[i] = X[m].sum(axis=0)
                    cnts[i] = int(m.sum())
                yield pd.DataFrame(
                    {
                        "cell": labels[present].astype(np.int32),
                        "vsum": list(sums),
                        "n": cnts,
                    }
                )

        return v0.mapInPandas(kernel, "cell int, vsum array<long>, n long"), bc

    for _ in range(lloyd_rounds - 1):
        parts, parts_bc = _partial_sums(cell_ids, cent)
        cm = (
            parts.select(
                "cell", "n", F.posexplode("vsum").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(
                F.floor(
                    F.sum("val").cast("double") / F.sum("n") + F.lit(0.5)
                )
                .cast("long")
                .alias("cv")
            )
        )
        rows = (
            cm.groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s.cv,
                ).alias("cvec")
            )
            .orderBy("cell")  # cells a round left EMPTY drop, as in the
            .collect()  # fixed-k twin (the oracle rebuilds c1 from cm)
        )
        cell_ids = np.array([r["cell"] for r in rows], dtype=np.int64)
        cent = np.array([r["cvec"] for r in rows], dtype=np.int64)
        # the collect above fully consumed this round's centroid
        # broadcast — drop its executor copies now, not at job end
        parts_bc.unpersist(blocking=False)

    # single consumer below — no checkpoint needed. The final
    # broadcast stays live (it is consumed when the CALLER materializes
    # the returned frame — the one bounded in-flight copy); the
    # per-round ones above are the accumulation hazard.
    final, _final_bc = _assign(cell_ids, cent)

    # The dup graph's edges are IN-CELL by construction, so the
    # entire closure + group-size + survivor tail runs locally per
    # cell (see _int_cell_groups_fn)
    return (
        final.select("cell", "id", "v", "d2")
        .groupBy("cell")
        .applyInPandas(
            _int_cell_groups_fn(dim, threshold),
            f"id {id_t}, cell int, group_id {id_t}, group_size long, keep boolean",
        )
    )


def semantic_dedup_coarse(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_size: int = 250,
    threshold: float = 0.9,
    lloyd_rounds: int = 2,
    coarse_cells: int | None = None,
) -> DataFrame:
    """SemDeDup with TWO-LEVEL (coarse-routed) assignment — the
    documented next lever past :func:`semantic_dedup_prod`'s ~50M-vector
    broadcast ceiling (round-11 verdict ask #5). prod broadcasts the
    whole k×dim fine-centroid table (k = ceil(n/target) grows with the
    corpus: ~100 MB at 50M vectors) and pays n·k·dim flops per
    assignment round. Here assignment routes through a SMALL coarse
    quantizer (kc = ceil(sqrt(k)) by default, the classic IVF sizing):

    1. fine seeds = k smallest-md5 rows (exactly prod's seeding);
       coarse seeds = the FIRST kc fine seeds, refined by one
       exact-int Lloyd round over the fine-seed table (a k-row
       metadata computation), then FROZEN;
    2. each round, fine centroids route to their nearest coarse center
       (k·kc·dim driver-side flops — metadata), and each VECTOR takes
       coarse-argmin over the ≤kc live coarse centers (a tiny
       broadcast), then fine-argmin among only that bucket's fine
       centroids, delivered per-bucket via a cogrouped applyInPandas —
       the k×dim table is SHUFFLED in ~sqrt(k)-sized slices, never
       broadcast whole, and per-vector flops drop from n·k·dim to
       ~2·n·sqrt(k)·dim (the measured fan-in bound);
    3. the pair scan + local union-find tail is prod's, verbatim.

    The routed argmin is the standard two-level APPROXIMATION (a
    vector's true nearest fine centroid may sit in a neighboring
    coarse bucket) — acceptable for SemDeDup cell BOUNDING, where any
    reasonable partition works (Abbas et al. 2023 §3 use faiss IVF the
    same way). Every arithmetic step keeps prod's int-exact discipline
    (micro-unit int64, f64-BLAS behind the 2^53 guard, half-up-6dp
    decisions, all ties deterministic), so the DuckDB twin replays the
    ROUTING itself bit-for-bit: vectors routed to a bucket whose fine
    centroids all vanished would be unassignable, so coarse candidates
    are restricted to buckets that own >=1 fine centroid — in both
    engines.

    Output schema matches the siblings: one row per vector,
    ``(id, cell, group_id, group_size, keep)``."""
    import math

    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.corpus_guard import id_spark_type

    id_t = id_spark_type(emb, id_col)
    v0 = emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
        ).alias("v"),
    ).transform(stage_checkpoint, eager=False)
    # one job for both scalars (guide §1 — don't pay two action
    # barriers for metadata one scan yields): n and dim together;
    # F.first is order-arbitrary but dim is constant across rows
    nd = v0.agg(F.count("*").alias("n"), F.first("v").alias("v1")).head()
    n = nd["n"]
    k = max(1, math.ceil(n / target_cell_size))
    dim = len(nd["v1"]) if nd["v1"] is not None else 0

    seeds = (
        v0.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(k)
        .collect()
    )
    cell_ids = np.arange(k, dtype=np.int64)
    cent = np.array([r["v"] for r in seeds], dtype=np.int64)

    kc = max(1, min(int(coarse_cells or math.ceil(math.sqrt(k))), k))
    # coarse quantizer: first kc fine seeds, one exact-int refinement
    # round over the k fine seeds (ties to the lower g; half-up int
    # mean; a coarse seed no fine seed picked drops) — then FROZEN
    g_seed = cent[:kc]
    glab = np.argmin(_int_d2_matrix(cent, g_seed, dim), axis=1)
    g_ids, g_rows = [], []
    for g in range(kc):
        m = glab == g
        if m.any():
            s = cent[m].sum(axis=0, dtype=np.int64)
            g_rows.append(
                np.floor(s.astype(np.float64) / int(m.sum()) + 0.5).astype(
                    np.int64
                )
            )
            g_ids.append(g)
    g_ids = np.array(g_ids, dtype=np.int64)
    gmat = np.stack(g_rows)

    sp = emb.sparkSession

    def _routed(cell_ids_arr: np.ndarray, cmat: np.ndarray, partials: bool):
        # fine->coarse routing table: k rows, driver-side metadata
        route = g_ids[np.argmin(_int_d2_matrix(cmat, gmat, dim), axis=1)]
        present = np.unique(route)
        keepm = np.isin(g_ids, present)
        bc = sp.sparkContext.broadcast((g_ids[keepm], gmat[keepm]))

        def coarse_kernel(batches):
            gids, G = bc.value  # live buckets only, g ascending
            for pdf in batches:
                X = _micro_mat(pdf["v"], dim)
                rows = np.argmin(_int_d2_matrix(X, G, dim), axis=1)
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "v": pdf["v"],
                        "g": gids[rows].astype(np.int32),
                    }
                )

        routed = v0.mapInPandas(
            coarse_kernel, f"id {id_t}, v array<long>, g int"
        )
        fine = sp.createDataFrame(
            [
                (int(route[i]), int(cell_ids_arr[i]), [int(x) for x in cmat[i]])
                for i in range(len(cell_ids_arr))
            ],
            "g int, cell int, cvec array<long>",
        )

        def _bucket(l: pd.DataFrame, r: pd.DataFrame):
            r = r.sort_values("cell")  # ties -> lower fine cell
            C = _micro_mat(r["cvec"], dim)
            cells = r["cell"].to_numpy()
            X = _micro_mat(l["v"], dim)
            d2 = _int_d2_matrix(X, C, dim)
            rows = np.argmin(d2, axis=1) if len(X) else np.empty(0, np.int64)
            return X, cells, rows, d2

        if partials:

            def fine_partials(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
                X, cells, rows, _ = _bucket(l, r)
                present_c = np.unique(rows)
                sums = np.zeros((len(present_c), dim), dtype=np.int64)
                cnts = np.zeros(len(present_c), dtype=np.int64)
                for i, rr in enumerate(present_c):
                    m = rows == rr
                    sums[i] = X[m].sum(axis=0)
                    cnts[i] = int(m.sum())
                return pd.DataFrame(
                    {
                        "cell": cells[present_c].astype(np.int32),
                        "vsum": list(sums),
                        "n": cnts,
                    }
                )

            out = (
                routed.groupBy("g")
                .cogroup(fine.groupBy("g"))
                .applyInPandas(fine_partials, "cell int, vsum array<long>, n long")
            )
        else:
            # FUSED final kernel (guide §8 — move the payload once):
            # a fine cell's members are exactly the vectors of its own
            # coarse bucket that argmin to it, so the per-cell
            # union-find tail can run INSIDE the bucket task — the
            # pre-r12 shape re-shuffled the full (id, v) payload a
            # second time by cell and paid one more Python stage for
            # the same per-cell row sets.
            cell_fn = _int_cell_groups_fn(dim, threshold)

            def fine_groups(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
                X, cells, rows, d2 = _bucket(l, r)
                if not len(X):
                    # len(X) == len(l) by construction (_bucket builds X
                    # from l["v"]); build every column zero-length so a
                    # future rows-without-centroids case fails loudly
                    # instead of a length-mismatch constructor crash
                    empty = l.iloc[0:0]
                    return pd.DataFrame(
                        {
                            "id": empty["id"],
                            "cell": pd.Series([], dtype="int32"),
                            "group_id": empty["id"],
                            "group_size": pd.Series([], dtype="int64"),
                            "keep": pd.Series([], dtype="bool"),
                        }
                    )
                d2v = d2[np.arange(len(rows)), rows].astype(np.int64)
                parts_out = []
                for ci in np.unique(rows):
                    m = rows == ci
                    parts_out.append(
                        cell_fn(
                            pd.DataFrame(
                                {
                                    "id": l["id"].to_numpy()[m],
                                    "v": l["v"].to_numpy()[m],
                                    "cell": np.full(
                                        int(m.sum()), cells[ci], dtype=np.int32
                                    ),
                                    "d2": d2v[m],
                                }
                            )
                        )
                    )
                return pd.concat(parts_out, ignore_index=True)

            out = (
                routed.groupBy("g")
                .cogroup(fine.groupBy("g"))
                .applyInPandas(
                    fine_groups,
                    f"id {id_t}, cell int, group_id {id_t}, "
                    "group_size long, keep boolean",
                )
            )
        return out, bc

    for _ in range(lloyd_rounds - 1):
        parts, parts_bc = _routed(cell_ids, cent, partials=True)
        # ONE exchange (guide §2.3 — aggregate before you shuffle): the
        # per-task partial sums fold elementwise per cell via an int64
        # array zip (order-free exact adds), replacing the pre-r12
        # posexplode → groupBy(cell,pos) → groupBy(cell) two-exchange
        # regroup; the half-up mean per component is value-identical.
        zero = F.array_repeat(F.lit(0).cast("long"), dim)
        cm = parts.groupBy("cell").agg(
            F.sum("n").alias("ntot"),
            F.aggregate(
                F.collect_list("vsum"),
                zero,
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("vs"),
        )
        rows = (
            cm.select(
                "cell",
                F.transform(
                    "vs",
                    lambda s: F.floor(
                        s.cast("double") / F.col("ntot") + F.lit(0.5)
                    ).cast("long"),
                ).alias("cvec"),
            )
            .orderBy("cell")  # empty cells drop, as in prod
            .collect()
        )
        cell_ids = np.array([r["cell"] for r in rows], dtype=np.int64)
        cent = np.array([r["cvec"] for r in rows], dtype=np.int64)
        parts_bc.unpersist(blocking=False)

    final, _final_bc = _routed(cell_ids, cent, partials=False)
    return final


def incremental_dedup(
    delta: DataFrame,
    base: DataFrame,
    threshold: float = 0.2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingestion-time dedup: flag each NEW (delta) document against the
    EXISTING corpus (base) without re-deduping the corpus against
    itself — the incremental form a growing 100 TB corpus needs, where
    base-side state (text hashes + shingle postings) is written once
    and only the delta is scanned per batch.

    exact: md5(text) semi-match against base's distinct hash set.
    near:  inverted-index join delta-shingles × base-shingles, word
    n-gram Jaccard ≥ threshold; near_dup_of = lowest matching base id.

    Returns one row per delta doc:
    (id, is_exact_dup ∈ {0,1}, near_dup_of (or -1), n_near).
    """
    dh = delta.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(text_col).cast("binary")).alias("h"),
    )
    bh = base.select(F.md5(F.col(text_col).cast("binary")).alias("h")).distinct()
    exact = dh.join(
        bh.withColumn("_hit", F.lit(1)), "h", "left"
    ).select("id", F.coalesce("_hit", F.lit(0)).alias("is_exact_dup"))

    def sh_side(df: DataFrame, nm: str) -> DataFrame:
        s = df.select(F.col(id_col).alias(nm), _shingles(text_col, n).alias("sh"))
        return s.withColumn(f"n_{nm}", F.size("sh")).select(
            nm, f"n_{nm}", F.explode("sh").alias("shingle")
        )

    de, be = sh_side(delta, "id_a"), sh_side(base, "id_b")
    inter = (
        de.join(be, "shingle")
        .groupBy("id_a", "id_b", "n_id_a", "n_id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_id_a") + F.col("n_id_b") - F.col("n_inter"))
    near = (
        inter.where(jac >= threshold)
        .groupBy("id_a")
        .agg(F.min("id_b").alias("near_dup_of"), F.count("*").alias("n_near"))
        .select(F.col("id_a").alias("id"), "near_dup_of", "n_near")
    )
    return exact.join(near, "id", "left").select(
        "id",
        "is_exact_dup",
        F.coalesce("near_dup_of", F.lit(-1)).alias("near_dup_of"),
        F.coalesce("n_near", F.lit(0)).alias("n_near"),
    )


def substring_span_audit(
    df: DataFrame,
    span: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repeated-substring audit at token-span granularity (the
    exact-substring duplication Lee et al. 2022 deduplicate with a
    suffix array, reframed as a distributed hash query): every
    ``span``-token window is hashed; a window is DUPLICATED when its
    hash occurs in ≥2 distinct documents. Returns per-doc
    ``(doc_id, n_windows, n_dup_windows, dup_frac)`` for docs with at
    least one window — the curation signal for boilerplate/templated
    spans that survive document-level dedup.

    Shape: windows derive map-side (JVM array ops — one md5 per
    window position), then ONE shuffle on the span hash for the
    document-frequency count and one hash-keyed join back; the per-doc
    rollup rides the id key. Window hashing is md5-of-span-string —
    portable (the DuckDB oracle reproduces it verbatim); the fleet
    scale form is :func:`substring_span_audit_hashed` (xxhash64 over
    composed token hashes — ~8× cheaper hashing, 8-byte keys)."""
    # window strings via the shared shifted-zip fold (_shingles_raw —
    # ~30% cheaper than per-position slice+concat_ws even at span=15),
    # then one md5 per window.
    spans = F.transform(
        _shingles_raw(text_col, span), lambda s: F.md5(s.cast("binary"))
    )
    return _span_audit_rollup(df, spans, id_col)


def _hashed_spans_raw(text_col: str, n: int, family: str = "xxhash64") -> F.Column:
    """NON-distinct 64-bit composed window hashes — the scale form of
    the span audit's window key: hash each token once, then combine
    the n consecutive token hashes position-sensitively with
    RIGHT-shift + xor (``xor_j(h_j >> j)``). Right shifts, unlike
    ``_hashed_shingles``'s left shifts, never leave int64 — DuckDB
    RAISES on left-shift overflow while Spark wraps, a silent
    cross-engine divergence once n-1 shift bits exceed the 60-bit md5
    family's 3 spare bits (fine at trigram n=3, fatal at span=15).
    Each term keeps its high 64-n bits, so the composed key still has
    ~60 bits of entropy — collisions whp-never at corpus scale.

    ``family``: "xxhash64" (prod, one JVM op per token) or "md5" (the
    portable ``md5_60bit_hash`` family DuckDB reproduces bit-
    identically, for the oracle-checked twin)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if family == "md5":
        th = F.transform(toks, md5_60bit_hash)
    else:
        th = F.transform(toks, lambda t: F.xxhash64(t))

    def combine(th_arr: F.Column):
        def h(i: F.Column) -> F.Column:
            acc = F.get(th_arr, i)
            for j in range(1, n):
                acc = acc.bitwiseXOR(F.shiftright(F.get(th_arr, i + j), j))
            return acc

        # same size<n guard as _shingles_raw (sequence would descend)
        idx = F.when(
            F.size(th_arr) >= n, F.sequence(F.lit(0), F.size(th_arr) - F.lit(n))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, h)

    # bind the token-hash array once per row (see _hashed_shingles)
    return F.get(F.transform(F.array(th), combine), 0)


def substring_span_audit_hashed(
    df: DataFrame,
    span: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    family: str = "xxhash64",
) -> DataFrame:
    """:func:`substring_span_audit` with 64-bit composed-hash window
    keys instead of md5-of-span-string — the fleet-scale form: no
    per-window string materialization (the string form builds and
    md5-hashes a ~100-char string per window position), one token-hash
    pass + integer shift/xor per window, and 8-byte long join/shuffle
    keys instead of 32-char md5 strings. Same output schema and —
    collisions whp-aside — identical values (equivalence asserted
    against the string form in tests). ``family="md5"`` is the
    oracle-checked twin; xxhash64 is the production default."""
    return _span_audit_rollup(
        df, _hashed_spans_raw(text_col, span, family=family), id_col
    )


def _span_audit_rollup(df: DataFrame, spans: F.Column, id_col: str) -> DataFrame:
    """Shared tail of the span-audit family: explode the per-doc
    window-key array, mark keys seen in ≥2 distinct docs, roll up per
    doc. The (id, key) posting list feeds TWO consumers (the
    document-frequency count and the join back), so it is
    checkpointed — without it Spark re-ran the whole window-build map
    stage per consumer (6.4 → ~3.8 s at sf0.1)."""
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import stage_checkpoint

    sp = df.select(F.col(id_col).alias("id"), F.explode(spans).alias("sh")).transform(
        stage_checkpoint, eager=False
    )
    hot = (
        sp.groupBy("sh")
        .agg(F.count_distinct("id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("sh", F.lit(True).alias("_dup"))
    )
    return (
        sp.join(hot, "sh", "left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_windows"),
            F.count("_dup").alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_windows") / F.col("n_windows"), 6)
        )
    )
