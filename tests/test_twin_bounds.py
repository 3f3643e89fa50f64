"""Round-7 verdict ask #3: bound every rows-only PRODUCTION form
DIRECTLY against its fully-oracled deterministic twin — not just each
form against ground truth separately.

Method: each clustering pair runs on a PLANTED-structure sf_dir (a
synthetic ``embeddings.parquet`` / ``documents.parquet`` written to
tmp_path with exactly the structure the production form's k expects).
On recoverable structure the production algorithm (MLlib / iterative
fit, RNG/impl-defined, hence rows-only at the oracle gate) and its
deterministic md5-seeded twin (fully DuckDB-value-hash-verified) must
agree up to label permutation — ARI ≥ the planted bound. On the real
unstructured sf0.001 embeddings the same pairs sit near ARI ≈ 0.3
(measured round 7), which bounds nothing; planted structure is what
makes the pairwise bound sharp.

The similarity production/twin pairs are bounded on the REAL sf0.001
corpus instead (top-5 result-set overlap): both forms chase the same
exact neighbors, so their result sets must overlap heavily even on
unstructured data. The quality-classifier pair is bounded by rank
agreement (Spearman) on the real corpus.

Registry-level entries are exercised end to end via their
``queries()`` callables on the planted dir — the same surface the
driver gate runs — so these tests double as a second driver-shaped
consumer of every audited rows-only entry.
"""

from __future__ import annotations

from collections import Counter
from math import comb

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- helpers
def adjusted_rand(a: dict, b: dict) -> float:
    """ARI between two labelings keyed by the same ids (pure stdlib)."""
    ids = sorted(a)
    assert sorted(b) == ids, "labelings cover different id sets"
    la = [a[i] for i in ids]
    lb = [b[i] for i in ids]
    n = len(ids)
    ct = Counter(zip(la, lb))
    ca, cb = Counter(la), Counter(lb)
    sidx = sum(comb(v, 2) for v in ct.values())
    sa = sum(comb(v, 2) for v in ca.values())
    sb = sum(comb(v, 2) for v in cb.values())
    exp = sa * sb / comb(n, 2)
    mx = (sa + sb) / 2
    return 1.0 if mx == exp else (sidx - exp) / (mx - exp)


def labels_of(name: str, spark, sf_dir: str) -> dict:
    """Run a registry query and return {id: first-label-column}."""
    return {r[0]: r[1] for r in QUERIES[name](spark, sf_dir).collect()}


def plant_blob_embeddings(
    spark, path, k: int, per: int = 40, sep: float = 12.0, dims: int = 8
) -> None:
    """Write an ``embeddings.parquet`` of k tight, well-separated blobs.

    Structure lives in dims 0-1 (the c-family clusters on
    ``embedding[0..1]``); the remaining dims carry small noise so the
    vectors are honestly multi-dimensional. Deterministic via a fixed
    RandomState."""
    rng = np.random.RandomState(7)
    rows = []
    for c in range(k):
        ang = 2 * np.pi * c / k
        cx, cy = sep * np.cos(ang), sep * np.sin(ang)
        for j in range(per):
            v = rng.normal(0.0, 0.25, size=dims)
            v[0] += cx
            v[1] += cy
            rows.append((c * per + j, [float(x) for x in v], c))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/embeddings.parquet")


#: per-block disjoint vocabularies — 12 distinct words each, so
#: cross-block word-3-gram Jaccard is exactly 0 and within-block
#: Jaccard is high (docs differ by one rotated word)
_BLOCK_VOCAB = [
    ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
     "golf", "hotel", "india", "juliet", "kilo", "lima"],
    ["mango", "nectar", "orange", "papaya", "quince", "raisin",
     "salak", "tomato", "ugli", "vanilla", "walnut", "xigua"],
    ["amber", "bronze", "copper", "dusk", "ember", "flint",
     "granite", "hearth", "iron", "jade", "kaolin", "loam"],
    ["anchor", "bosun", "cutter", "dinghy", "ensign", "fathom",
     "galley", "harbor", "inlet", "jetty", "keel", "lagoon"],
    ["accent", "ballad", "chorus", "duet", "encore", "forte",
     "gavotte", "hymn", "interval", "jingle", "key", "largo"],
    ["apex", "basalt", "crag", "divide", "escarp", "fault",
     "glacier", "horn", "icefall", "jumble", "knoll", "ledge"],
]


def plant_block_documents(
    spark, path, n_blocks: int, per: int | list[int] = 12, reps: int = 4
) -> None:
    """Write a ``documents.parquet`` of ``n_blocks`` near-duplicate
    blocks: every doc in a block repeats the block's 12-word vocabulary
    ``reps`` times, with ONE word swapped per doc — within-block
    word-3-gram Jaccard is high, cross-block is 0 (disjoint vocab).

    ``per`` may be a per-block size list: PIC embeds disconnected
    affinity components at a value proportional to component mass, so
    EQUAL-size blocks land on the same embedding value and are
    unseparable by construction (measured: ARI 0 for both c8 forms on
    4 symmetric blocks) — asymmetric sizes give each component a
    distinct value."""
    rows = []
    did = 0
    sizes = [per] * n_blocks if isinstance(per, int) else per
    for b in range(n_blocks):
        vocab = _BLOCK_VOCAB[b]
        for j in range(sizes[b]):
            words = (vocab * reps).copy()
            # one deterministic per-doc tweak (keeps docs near, not equal)
            words[j % len(words)] = f"{vocab[0]}{j}"
            text = " ".join(words)
            rows.append((did, text, "en", f"block{b}", len(text)))
            did += 1
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")


# ------------------------------------------------- clustering twin bounds
def test_c1_kmeans_vs_md5lloyd_twin_on_planted_blobs(spark, tmp_path):
    """c1 (MLlib kmeans||, k=9) vs c1b (md5-Lloyd twin): on 9 planted
    blobs MLlib recovers the partition exactly; the twin's fixed
    md5-seeding + two Lloyd rounds can merge/split a blob when the md5
    rank lands two seeds in one blob (measured ARI 0.760) — floor set
    a margin below the measured band."""
    plant_blob_embeddings(spark, tmp_path, k=9)
    a = labels_of("c1_kmeans", spark, str(tmp_path))
    b = labels_of("c1b_kmeans_md5lloyd", spark, str(tmp_path))
    assert adjusted_rand(a, b) >= 0.65


def test_c7_gmm_vs_md5em_twin_on_planted_blobs(spark, tmp_path):
    """c7 (MLlib GMM, k=9) vs c7b (md5-EM twin) on 9 planted blobs
    (measured ARI 0.658 — the twin's fixed EM rounds inherit the
    md5-seeding merge/split behavior; floor a margin below)."""
    plant_blob_embeddings(spark, tmp_path, k=9)
    a = labels_of("c7_gmm", spark, str(tmp_path))
    b = labels_of("c7b_gmm_md5em", spark, str(tmp_path))
    assert adjusted_rand(a, b) >= 0.55


def test_c6_bisecting_vs_md5lloyd_twin_on_planted_blobs(spark, tmp_path):
    """c6 (MLlib bisecting, k=9) vs c6b (md5 twin, k=8): plant 8 blobs
    — the twin's k. c6's extra split can only subdivide one blob, so
    agreement stays high (measured ARI 0.937; floor below the split
    penalty)."""
    plant_blob_embeddings(spark, tmp_path, k=8)
    a = labels_of("c6_bisecting_kmeans", spark, str(tmp_path))
    b = labels_of("c6b_bisecting_md5lloyd", spark, str(tmp_path))
    assert adjusted_rand(a, b) >= 0.8


def test_c9_kmedoids_and_clara_vs_md5pam_twin(spark, tmp_path):
    """c9 (exact PAM, k=5) and c9b (CLARA) vs c9c (md5-PAM twin) on 5
    planted blobs: both production forms against the twin (measured
    ARI 0.718 each — the twin's 2-round md5-PAM merge/split bound;
    floor a margin below)."""
    plant_blob_embeddings(spark, tmp_path, k=5)
    c9c = labels_of("c9c_kmedoids_md5pam", spark, str(tmp_path))
    a = labels_of("c9_kmedoids", spark, str(tmp_path))
    assert adjusted_rand(a, c9c) >= 0.6
    b = labels_of("c9b_kmedoids_clara", spark, str(tmp_path))
    assert adjusted_rand(b, c9c) >= 0.6


def test_c4_selection_vs_md5_twin_agree_on_best_k(spark, tmp_path):
    """c4 (MLlib-backed silhouette selection) vs c4b (fully-oracled
    md5-Lloyd selection): on 4 planted blobs — inside both k-grids —
    both must select k=4 as the silhouette argmax."""
    plant_blob_embeddings(spark, tmp_path, k=4)
    c4 = {r["k"]: r["score_pct"] for r in
          QUERIES["c4_silhouette_selection"](spark, str(tmp_path)).collect()}
    c4b = {r["k"]: r["score"] for r in
           QUERIES["c4b_selection_md5lloyd"](spark, str(tmp_path)).collect()}
    assert max(c4, key=c4.get) == 4
    assert max(c4b, key=c4b.get) == 4


def test_c8_graph_clusters_vs_md5pic_twin_on_planted_blocks(spark, tmp_path):
    """c8 (MLlib PIC over the near-dup affinity graph, k=4) vs c8b
    (md5-Lloyd PIC twin): on 4 planted near-dup blocks with disjoint
    vocabularies (cross-block Jaccard 0) and DISTINCT sizes (see
    plant_block_documents on PIC's symmetric-component degeneracy)
    both must recover the blocks (PIC recovers them exactly; the
    md5-Lloyd twin merges one adjacent pair of embedding values —
    measured ARI 0.721, floor a margin below)."""
    plant_block_documents(spark, tmp_path, n_blocks=4, per=[8, 12, 16, 20])
    a = labels_of("c8_graph_clusters", spark, str(tmp_path))
    b = labels_of("c8b_graph_md5pic", spark, str(tmp_path))
    assert adjusted_rand(a, b) >= 0.6


def test_text_tfidf_kmeans_vs_md5_twin_on_planted_topics(spark, tmp_path):
    """text_tfidf_kmeans (MLlib k-means over hashed TF-IDF, k=6) vs
    text_tfidf_md5kmeans: 6 planted disjoint-vocabulary topics
    (measured ARI 0.796; floor a margin below)."""
    plant_block_documents(spark, tmp_path, n_blocks=6)
    a = labels_of("text_tfidf_kmeans", spark, str(tmp_path))
    b = labels_of("text_tfidf_md5kmeans", spark, str(tmp_path))
    assert adjusted_rand(a, b) >= 0.7


# ------------------------------------------------- similarity twin bounds
def plant_satellite_embeddings(spark, path, dims: int = 64) -> None:
    """Write an ``embeddings.parquet`` where each query vector
    (vec_id < 10, the registry's pinned query set) has exactly FIVE
    unambiguous nearest neighbors: 5 satellites at cosine ≈ 0.9999
    along the query's direction, against a 200-vector random
    background whose max cosine to any query sits far below. On the
    real sf0.001 corpus the production/twin top-5 sets overlap only
    ~0.3 (measured round 7: both have partial recall and miss
    DIFFERENT near-ties), so real data cannot bound the pair;
    planted unambiguous neighbors can."""
    rng = np.random.RandomState(11)
    rows = []
    for q in range(10):
        u = np.zeros(dims)
        u[q] = 1.0
        u[10 + q] = 0.3
        u /= np.linalg.norm(u)
        rows.append((q, [float(x) for x in u], q))
        for s in range(5):
            v = u + rng.normal(0.0, 0.01, size=dims)
            rows.append((100 + 5 * q + s, [float(x) for x in v], q))
    for b in range(200):
        v = rng.normal(0.0, 1.0, size=dims)
        v /= np.linalg.norm(v)
        rows.append((1000 + b, [float(x) for x in v], -1))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/embeddings.parquet")


@pytest.mark.parametrize(
    "prod,twin,floor",
    [
        ("sim_ivf_topk", "sim_ivfb_topk", 0.9),
        ("sim_pq_topk", "sim_pqb_topk", 0.9),
        ("sim_ivfpq_topk", "sim_ivfpqb_topk", 0.9),
    ],
)
def test_sim_production_vs_deterministic_twin_overlap(
    spark, tmp_path, prod, twin, floor
):
    """Each MLlib-quantizer ANN production form vs its md5-Lloyd twin:
    on the planted-satellite corpus every query's top-5 is unambiguous,
    so both quantizer families must retrieve (near-)identical result
    sets — the direct production-vs-twin bound. Each form's
    recall-vs-bruteforce floor on real data is asserted separately in
    test_similarity_ann.py."""
    plant_satellite_embeddings(spark, tmp_path)
    sa = {(r["query_id"], r["nbr_id"])
          for r in QUERIES[prod](spark, str(tmp_path)).collect()}
    sb = {(r["query_id"], r["nbr_id"])
          for r in QUERIES[twin](spark, str(tmp_path)).collect()}
    assert len(sa & sb) / len(sa | sb) >= floor


def test_sim_persisted_production_vs_twin_overlap(spark, tmp_path):
    """sim_ivf_persisted_topk (MLlib coarse quantizer, on-disk index)
    vs sim_ivfb_persisted (md5-Lloyd persisted twin) on the planted-
    satellite corpus — the serve-path pair's direct bound."""
    plant_satellite_embeddings(spark, tmp_path)
    sa = {(r["query_id"], r["nbr_id"])
          for r in QUERIES["sim_ivf_persisted_topk"](spark, str(tmp_path)).collect()}
    sb = {(r["query_id"], r["nbr_id"])
          for r in QUERIES["sim_ivfb_persisted"](spark, str(tmp_path)).collect()}
    assert len(sa & sb) / len(sa | sb) >= 0.9


def test_c3_kshape_vs_md5_twin_on_planted_shapes(spark):
    """c3's kernel (SIGMOD'15 K-Shape Lloyd loop) vs c3b's kernel
    (fixed md5-seeded NCC assignment) on planted shape families —
    operator-level because the registry forms share the same loader
    but real sf0.001 carries only 15 unstructured series (measured
    registry-pair ARI 0.10, bounds nothing). Three planted families
    (sine / square / ramp, random amplitude, phase bounded so the best
    alignment lag fits the twin's ±8 NCC window — unbounded random
    phase needs lags up to ±L/2, which the full K-Shape's FFT NCC
    searches but the bounded twin by design does not: measured ARI
    0.33 at ±8, 0.83 at ±31) must be recovered identically — measured
    ARI 1.0 under the bounded phases."""
    import math

    from the_framework_for_clustering_time_series_data_spark.operators import align
    from the_framework_for_clustering_time_series_data_spark.operators.cluster import (
        kshape,
        kshape_md5_assign,
    )

    rng = np.random.RandomState(5)
    rows = []
    L = 64
    for sid in range(18):
        fam = sid % 3
        phase = rng.uniform(0, 0.6)
        amp = rng.uniform(0.5, 2.0)
        for t in range(L):
            x = 2 * np.pi * t / L + phase
            if fam == 0:
                val = amp * math.sin(x)
            elif fam == 1:
                val = amp * (1.0 if (t / L * 4 + phase) % 2 < 1 else -1.0)
            else:
                val = amp * (((t / L + phase / (2 * np.pi)) % 1.0) * 2 - 1)
            rows.append((sid, t, float(val + 0.05 * rng.standard_normal())))
    df = spark.createDataFrame(rows, "series_id long, t long, value double")
    nested = align.to_nested(df)
    a = {r["series_id"]: r["prediction"]
         for r in kshape(nested, k=3, seed=0).collect()}
    b = {r["id"]: r["cell"]
         for r in kshape_md5_assign(nested, k=3, max_lag=8).collect()}
    assert adjusted_rand(a, b) >= 0.9


def test_quality_classifier_vs_deterministic_logit_rank_agreement(spark):
    """text_quality_classifier (MLlib LBFGS logistic) vs
    text_quality_logit_det (fully-replayed GD twin): the two models'
    quality scores must RANK the real sf0.001 corpus near-identically
    (Spearman ≥ floor) — the bound that matters for a filtering
    pipeline, where thresholds act on rank."""
    pa = {r["id"]: r["quality_prob"]
          for r in QUERIES["text_quality_classifier"](spark, SF001).collect()}
    pb = {r["id"]: r["quality_prob"]
          for r in QUERIES["text_quality_logit_det"](spark, SF001).collect()}
    ids = sorted(pa)
    assert sorted(pb) == ids

    def ranks(d):
        order = sorted(ids, key=lambda i: (d[i], i))
        return {i: r for r, i in enumerate(order)}

    ra, rb = ranks(pa), ranks(pb)
    n = len(ids)
    ma = sum(ra.values()) / n
    mb = sum(rb.values()) / n
    num = sum((ra[i] - ma) * (rb[i] - mb) for i in ids)
    den = (
        sum((ra[i] - ma) ** 2 for i in ids)
        * sum((rb[i] - mb) ** 2 for i in ids)
    ) ** 0.5
    assert num / den >= 0.8
