"""Regenerate OPERATORS.md from the live registry.

Usage: python tools/gen_operators_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


#: Why each remaining rows-only entry has no DuckDB value-hash oracle —
#: the documented per-entry verdict the coverage contract requires.
#: Categories: RNG/impl-defined (the value depends on MLlib/numpy
#: internals no SQL engine reproduces), iterative-fit (data-dependent
#: iteration counts / float convergence), sign-indeterminate,
#: approx-sketch (implementation-defined summaries), convertible (a
#: replay oracle is feasible with bounded effort — candidates for the
#: next conversion round). Local invariant/equivalence tests cover all
#: of them (tests/, cited per entry).
ROWS_ONLY_NOTES = {
    "ml_isotonic": "impl-defined pooling order: MLlib's distributed PAV merges per-partition pools associatively but the merge order is scheduler-defined. test_ml.py holds its fit equal (1e-6) to the fully-oracled exact twin ml_isotonic_minimax — the strongest check in the registry for a rows-only entry.",
    "a5b_percentile_sketch": "approx-sketch: approxQuantile is a Greenwald-Khanna sketch whose outputs are implementation-defined within the error bound; DuckDB has no replayable twin. Exact-percentile parity is covered by a7_histogram/q25 oracles; sketch error bound tested in test_properties.py.",
    "c1_kmeans": "RNG/impl-defined: MLlib kmeans|| seeding + parallel float reductions; labels are run-stable but not engine-reproducible. ARI-vs-ground-truth and determinism tests in test_ml.py; twin-bounded: ARI vs the fully-oracled c1b_kmeans_md5lloyd on planted blobs asserted in test_twin_bounds.py.",
    "c3_kshape": "iterative-fit: driver Lloyd loop over FFT-based NCC and an eigenvector extraction (sign-normalized), data-dependent iteration count. Separation + convergence tests in test_ml.py. Its deterministic twin c3b_kshape_md5 IS fully oracle-checked; twin-bounded: both kernels held to ARI 1.0 on planted bounded-phase shape families in test_twin_bounds.py.",
    "c4_silhouette_selection": "depends on c1-family MLlib fits (RNG/impl-defined); the EXACT silhouette arithmetic is oracle-checked separately (c4_silhouette_exact); twin-bounded: best-k agreement with the fully-oracled c4b_selection_md5lloyd on planted blobs asserted in test_twin_bounds.py.",
    "c6_bisecting_kmeans": "RNG/impl-defined: MLlib bisecting k-means split sequence. Hierarchy-shape invariants tested in test_ml.py. Its deterministic twin c6b_bisecting_md5lloyd IS fully oracle-checked; twin-bounded: planted-blob ARI vs the twin asserted in test_twin_bounds.py.",
    "c7_gmm": "RNG/impl-defined + iterative-fit: EM from random init, responsibilities depend on float exp/log reductions. Mixture-recovery test in test_ml.py. Its deterministic twin c7b_gmm_md5em IS fully oracle-checked; twin-bounded: planted-blob ARI vs the twin asserted in test_twin_bounds.py.",
    "c8_graph_clusters": "iterative-fit: MLlib PowerIterationClustering RDD loop; eigen-iteration floats are reduction-order-dependent. Cluster-agreement invariants in test_graph.py. Its deterministic twin c8b_graph_md5pic IS fully oracle-checked; twin-bounded: planted asymmetric near-dup blocks, ARI vs the twin asserted in test_twin_bounds.py.",
    "c9_kmedoids": "iterative-fit: the convergence loop and farthest-point init are data-dependent argmin chains over float deltas; no bounded SQL replay. Medoid-membership + cost-descent tests in test_ml.py. Its deterministic twin c9c_kmedoids_md5pam IS fully oracle-checked; twin-bounded: planted-blob ARI vs the twin asserted in test_twin_bounds.py.",
    "c9b_kmedoids_clara": "iterative-fit: CLARA = PAM (above) on md5 samples + broadcast scoring; inherits PAM's non-replayability. Equivalence-to-PAM-below-sample-size test in test_ml.py. The family's deterministic twin c9c_kmedoids_md5pam IS fully oracle-checked; twin-bounded: planted-blob ARI vs the twin asserted in test_twin_bounds.py.",
    "d2_approx_distinct": "approx-sketch: HLL++ registers are implementation-defined; DuckDB's approx_count_distinct uses a different sketch. Relative-error bound vs exact COUNT(DISTINCT) tested in test_properties.py.",
    "e1_autoencoder_latent": "iterative-fit: gradient-descent-trained autoencoder weights; inference is deterministic given weights but weights are not SQL-derivable. Reconstruction-learning tests in test_ml.py.",
    "e2_pca": "sign-indeterminate: eigenvector signs/column order are solver-defined; the VARIANCE spectrum is oracle-checked (e2b_pca_variance). Projection-geometry tests in test_ml.py, plus the strongest available equivalence: test_pca_matches_numpy_covariance_eigen holds the MLlib fit to an independent numpy eigendecomposition of the same covariance. The e2c_pca_powerit twin runs on the embeddings table (different input), so a direct pairwise bound is not same-shape; the numpy equivalence is the twin-bound here.",
    "e3_umap": "iterative-fit: SGD layout (umap-learn) or Laplacian eigenmaps fallback; both solver-defined. Neighborhood-preservation test in test_ml.py. Its deterministic twin e3b_spectral_md5 IS fully oracle-checked but consumes the embeddings table (different input than e3's 15 aligned series), so no same-shape pairwise bound exists; the neighborhood-preservation invariant is the production form's bound.",
    "pipeline_e2e": "composite: chains model fits (autoencoder/kmeans) whose stages are individually rows-only above; the relational stages of the pipeline are oracle-checked as separate queries. End-to-end matrix tested in test_pipeline_matrix.py. Its deterministic spine pipeline_e2e_det IS fully oracle-checked through the same facade; no direct pairwise bound — the two return different shapes (cluster centroids vs per-series assignments) by design, and every constituent stage is bounded individually (see c1/e1 rows).",
    "sim_ivf_persisted_topk": "depends on a seeded MLlib kmeans coarse quantizer (RNG/impl-defined); list-pruning correctness tested via parity-with-bruteforce in test_similarity_ann.py; twin-bounded: result-set overlap >=0.9 with sim_ivfb_persisted on the planted-satellite corpus asserted in test_twin_bounds.py.",
    "sim_ivf_topk": "same MLlib coarse-quantizer dependency as sim_ivf_persisted_topk; recall floor tested in test_similarity_ann.py. Its deterministic-Lloyd twin sim_ivfb_topk IS fully oracle-checked; twin-bounded: planted-satellite result-set overlap >=0.9 vs the twin asserted in test_twin_bounds.py.",
    "sim_ivfpq_topk": "MLlib kmeans coarse quantizer + per-subspace PQ codebooks (nested seeded fits); ADC-vs-exact parity tested in test_similarity_ann.py. Its deterministic twin sim_ivfpqb_topk IS fully oracle-checked; twin-bounded: planted-satellite result-set overlap >=0.9 vs the twin asserted in test_twin_bounds.py.",
    "sim_pq_topk": "seeded per-subspace kmeans codebooks (RNG/impl-defined); quantization-error + recall tests in test_similarity_ann.py. Its deterministic twin sim_pqb_topk IS fully oracle-checked; twin-bounded: planted-satellite result-set overlap >=0.9 vs the twin asserted in test_twin_bounds.py.",
    "text_quality_classifier": "iterative-fit: logistic regression trained by LBFGS (float reduction order); score monotonicity + AUC tests in test_text_extra.py. Its deterministic twin text_quality_logit_det IS fully oracle-checked; twin-bounded: Spearman rank agreement >=0.8 between the two models' scores (measured 0.908) asserted in test_twin_bounds.py.",
    "text_tfidf_kmeans": "RNG/impl-defined: MLlib kmeans over TF-IDF vectors; the TF-IDF arithmetic itself is oracle-checked in the text family. Topic-separation test in test_text_extra.py. Its deterministic twin text_tfidf_md5kmeans IS fully oracle-checked; twin-bounded: planted disjoint-vocabulary topics, ARI vs the twin asserted in test_twin_bounds.py.",
}


#: Static appendix: surfaces outside the registry whose verification
#: status the coverage contract still inventories.
_APPENDIX = [
    "",
    "## Environment-unverifiable surfaces (non-registry)",
    "",
    "| surface | verdict |",
    "|---|---|",
    "| `streaming/ops.py:running_series_stats_tws` (transformWithStateInPandas) | "
    "UNVERIFIED IN THIS CONTAINER: the TWS state-server wire protocol needs the "
    "`protobuf` package, which is not installed and (per the environment "
    "contract) cannot be pip-installed; "
    "`tests/test_streaming.py::test_running_stats_tws_state_across_batches` "
    "self-skips with that reason. The SAME running-moments semantics ARE "
    "verified through the `applyInPandasWithState` twin "
    "(`running_series_stats_state`, checkpoint-restart exactly-once tests); "
    "the TWS form exists for the Spark-4 surface and runs wherever protobuf "
    "is present. |",
    "| `operators/embed.py:embedding_umap` (umap-learn path) | env-gated: "
    "umap-learn absent here; the Laplacian-Eigenmaps fallback is the active, "
    "tested path (neighborhood-preservation test). |",
    "| `operators/multimodal.py` lossy audio (MP3/AAC/OGG) + compressed "
    "video (H.264…) decode | env-gated stubs by design (these genuinely "
    "need native codec libs, absent in this container); "
    "PNG / baseline+progressive JPEG / GIF / BMP / WAV-PCM / "
    "WAV-IMA-ADPCM / G.711 µ-law+A-law / FLAC / Y4M decode is real, "
    "stdlib-only, and tested against independent test-side encoders "
    "(G.711 byte-for-byte against the audioop reference). |",
    "",
    "## Micro-unit integer-sum scale ceilings (round-6 audit; "
    "empirically exercised round 7)",
    "",
    "The exact-arithmetic discipline sums `floor(x*1e6+0.5)` (or 1e12-grid "
    "pico) quanta as integers. DuckDB's `sum(BIGINT)` promotes to HUGEINT "
    "(int128); Spark's `sum(long)` silently wraps at ~9.2e18 under non-ANSI "
    "mode — so every micro-unit aggregate whose cardinality grows with the "
    "CORPUS runs in `decimal(38,0)` on the Spark side (~1e38 headroom): "
    "`plan_tools.exact_mean6` (all chained-mean sites), q11's per-part "
    "revenue sums, the quality-logit pico-gradient sums, and the e2c PCA "
    "scatter/score sums. EMPIRICALLY EXERCISED (round 7, "
    "tests/test_scale_smoke.py `*_beyond_int64_ceiling`): synthetic slices "
    "drive each hardened site's sums PAST 9.2e18 (exact_mean6 ~1.8e19; q11 "
    "threshold mean ~1.3e20; quality-logit round-1 gradient ~1.4e19) with "
    "exact DuckDB-HUGEINT parity asserted, and a raw int64 sum of the same "
    "quanta is asserted to corrupt. Two per-ROW quantum ceilings of the "
    "shared oracle discipline were discovered and are now explicit: (a) any "
    "stage that re-quantizes an aggregate as one BIGINT row (q11's "
    "threshold) needs that value < ~9.2e12; (b) e2c's end-to-end bound is "
    "the oracle's power-step S·w int64 product — micro scatter entry × "
    "micro weight — capping |S| < ~9.2e6, i.e. n·|v̄|² < 9.2e6 (DuckDB "
    "raises an explicit OutOfRange, never silent; the e2c smoke runs at "
    "~5e18 pico scatter sums, 550× past double exactness). The remaining "
    "int64 micro-sums are bounded by construction and carry these explicit "
    "ceilings:",
    "",
    "| site | sum cardinality bound | ceiling |",
    "|---|---|---|",
    "| cluster.py centroid means (c1b/c3b/c6b family) | members per cluster × "
    "normalized values ≤ ~1e6 micro | ~9e12 rows per cluster |",
    "| ml_plans c8b PIC weight/degree sums | nodes ≤ capped doc sample "
    "(1000) | unreachable |",
    "| symbolic/resample per-series window sums | points per series × value "
    "micro ≤ 1e9 | ~9e9 points per series |",
    "| similarity.py per-cell means | corpus cell members, values ≤ ~10 | "
    "~9e11 rows per cell |",
    "| e2c score folds (per-row dot) | 64 terms × pico products ≤ 2e13 | "
    "per-row, unreachable |",
]


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

    rows_only = sorted(n for n, _, c, _ in rows if c == "rows-only")
    missing = [n for n in rows_only if n not in ROWS_ONLY_NOTES]
    stale = [n for n in ROWS_ONLY_NOTES if n not in rows_only]
    if missing or stale:
        raise SystemExit(
            f"ROWS_ONLY_NOTES out of sync: missing={missing} stale={stale} — "
            "every rows-only entry needs a documented reason (or drop notes "
            "for entries that gained oracles)"
        )
    out += [
        "",
        "## Why the rows-only entries have no value-hash oracle",
        "",
        "Every rows-only entry carries a documented verdict: either the "
        "value is not SQL-reproducible (RNG / solver-defined floats / "
        "approx sketches / sign indeterminacy) or a replay oracle is "
        "feasible and queued (`CONVERTIBLE`). All are covered by local "
        "invariant/equivalence tests.",
        "",
        "| query | verdict |",
        "|---|---|",
    ]
    for n in rows_only:
        out.append(f"| `{n}` | {ROWS_ONLY_NOTES[n]} |")
    out += _APPENDIX
    (REPO / "OPERATORS.md").write_text("\n".join(out) + "\n")
    print(f"wrote OPERATORS.md: {len(rows)} queries, {n_oracle} oracles, "
          f"{len(rows_only)} rows-only (all annotated)")


if __name__ == "__main__":
    main()
