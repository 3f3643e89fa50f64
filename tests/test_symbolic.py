"""Invariant tests for the symbolic/diagnostic time-series plans
(plans/symbolic_plans.py). Exact values are covered by the DuckDB
oracle parity test; these check structural properties cheaply at
sf0.001.
"""

from __future__ import annotations

from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

from tests.conftest import SF_SMALL


def test_sax_symbols_in_alphabet(spark):
    rows = QUERIES["ts_paa_sax"](spark, SF_SMALL).collect()
    assert rows
    assert {r.sym for r in rows} <= {"a", "b", "c", "d"}
    # PAA of a z-normalized series: n_pts-weighted mean ~ 0 per series.
    by_series: dict[int, list] = {}
    for r in rows:
        by_series.setdefault(r.series_id, []).append(r)
    for segs in by_series.values():
        tot = sum(s.n_pts for s in segs)
        mean = sum(s.paa * s.n_pts for s in segs) / tot
        assert abs(mean) < 1e-4


def test_sax_motifs_repeat_threshold(spark):
    rows = QUERIES["ts_sax_motifs"](spark, SF_SMALL).collect()
    for r in rows:
        assert len(r.word) == 4 and set(r.word) <= set("abcd")
        assert r.n_occ >= 2
        assert 1 <= r.n_series <= r.n_occ


def test_cusum_changepoint_bounds(spark):
    rows = QUERIES["ts_cusum_changepoint"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.t_change < r.n
        assert r.cusum_max >= 0


def test_pair_correlation_range(spark):
    rows = QUERIES["ts_pair_correlation"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.sid_a < r.sid_b
        assert r.n_common >= 20
        if r.r is not None:
            assert -1.000001 <= r.r <= 1.000001


def test_decompose_additivity(spark):
    rows = QUERIES["ts_decompose_dow"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # rounded components re-sum to the rounded value within rounding slack
        assert abs(r.v - (r.trend + r.seasonal + r.resid)) < 5e-6


def test_holt_forecast_closed_forms(spark):
    """Holt on a constant series forecasts the constant; on an exactly
    linear series it extrapolates the line (both are fixed points of
    the recursion given the v0/v1-v0 initialization)."""
    from the_framework_for_clustering_time_series_data_spark.operators.forecast import holt_linear_forecast

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        rows.append((1, base + dt.timedelta(days=i), 5.0))            # constant
        rows.append((2, base + dt.timedelta(days=i), 2.0 + 3.0 * i))  # linear
    grid = spark.createDataFrame(
        rows, "series_id long, bucket timestamp, v_locf double"
    )
    out = {
        (r.series_id, r.h): r
        for r in holt_linear_forecast(grid).collect()
    }
    assert len(out) == 14
    for h in range(1, 8):
        assert abs(out[(1, h)].yhat - 5.0) < 1e-9
        assert abs(out[(2, h)].yhat - (2.0 + 3.0 * (29 + h))) < 1e-6
    # registry entry runs end-to-end on real data
    from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

    rows = QUERIES["ts_holt_forecast"](spark, SF_SMALL).collect()
    assert rows and {r.h for r in rows} == set(range(1, 8))


def test_verified_motifs_recover_planted_pair(spark):
    """Two series sharing an identical 32-point pattern (plus distinct
    noise elsewhere) must produce a verified pair at distance ~0; all
    outputs respect the no-overlap rule."""
    import math

    from the_framework_for_clustering_time_series_data_spark.operators.motifs import verified_motifs

    pattern = [math.sin(i / 3.0) * 2 + (i % 5) for i in range(32)]
    rows = []
    for sid, off in ((1, 0), (2, 37)):
        vals = [float(7 * ((i * 13 + sid) % 11)) for i in range(96)]
        vals[off : off + 32] = pattern
        # land the pattern on a segment boundary for series 2 as well
        if off % 8:
            vals = vals[: off - off % 8] + pattern + vals[off - off % 8 + 32 :]
        rows += [(sid, t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series_id long, t long, value double")
    out = verified_motifs(df).collect()
    assert out
    best = min(r.dist for r in out)
    cross = [r for r in out if r.sid_a != r.sid_b]
    assert cross and min(r.dist for r in cross) < 0.3
    assert best >= 0
    for r in out:
        if r.sid_a == r.sid_b:
            assert r.w_b - r.w_a >= 4
    # registry entry runs end-to-end on real data
    res = QUERIES["ts_motif_verified"](spark, SF_SMALL).collect()
    assert res
    for r in res:
        assert r.dist >= 0


def test_lttb_invariants(spark):
    from the_framework_for_clustering_time_series_data_spark.operators import resample
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events")
    daily = resample.bucket_rollup(ev, unit="day")
    out = resample.lttb_downsample(daily, threshold=20)
    rows = out.collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(r["series_id"], []).append(r)
    src = {
        (r["series_id"], r["bucket"]): round(r["v_avg"], 6)
        for r in daily.collect()
    }
    n_per_series = {}
    for r in daily.collect():
        n_per_series[r["series_id"]] = n_per_series.get(r["series_id"], 0) + 1
    for sid, picks in by_series.items():
        picks.sort(key=lambda r: r["pick"])
        n = n_per_series[sid]
        # count = min(threshold, n); endpoints kept; picks are source points
        assert len(picks) == min(20, n)
        buckets = [p["bucket"] for p in picks]
        assert buckets == sorted(buckets)
        src_buckets = sorted(
            b for (s, b) in src if s == sid
        )
        assert buckets[0] == src_buckets[0] and buckets[-1] == src_buckets[-1]
        for p in picks:
            assert (sid, p["bucket"]) in src
            assert abs(src[(sid, p["bucket"])] - p["v"]) < 1e-9


def test_lttb_keeps_extremum(spark):
    """On a V-shaped series the spike point must be selected."""
    import datetime

    from the_framework_for_clustering_time_series_data_spark.operators import resample

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base + datetime.timedelta(days=i), 1000.0 if i == 57 else float(i % 7))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "series_id long, bucket timestamp, v_avg double")
    out = resample.lttb_downsample(df, threshold=10).collect()
    assert len(out) == 10
    assert any(abs(r["v"] - 1000.0) < 1e-9 for r in out)


def test_lttb_sequential_means_long_series(spark):
    """On a 500-point series (next-bucket slices of ~26 points — well
    inside numpy's >=8-element pairwise-summation regime) the kernel's
    picks must equal a pure-Python reference that sums bucket means
    sequentially left-to-right, the association order the DuckDB oracle
    uses. Locks the sequential-mean contract the oracle's
    bit-identical-selection claim depends on."""
    import datetime
    import random

    from the_framework_for_clustering_time_series_data_spark.operators import resample

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)
    pts = [
        (base + datetime.timedelta(days=i), rng.uniform(-5, 5))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        [(1, b, v) for b, v in pts],
        "series_id long, bucket timestamp, v_avg double",
    )
    got = sorted(
        (r["pick"], r["bucket"]) for r in
        resample.lttb_downsample(df, threshold=20).collect()
    )

    # pure-Python sequential reference (no numpy in the hot arithmetic)
    x = [float(b.timestamp() * 1e9) for b, _ in pts]
    y = [v for _, v in pts]
    n = len(pts)
    import numpy as np

    edges = np.linspace(1, n - 1, 19).astype(int)
    idx = [0]
    for b in range(18):
        lo, hi = edges[b], edges[b + 1]
        nxt_lo = edges[b + 1]
        nxt_hi = edges[b + 2] if b + 2 < len(edges) else n
        ax, ay = x[idx[-1]], y[idx[-1]]
        sx = 0.0
        sy = 0.0
        for j in range(nxt_lo, nxt_hi):
            sx += x[j]
            sy += y[j]
        w = nxt_hi - nxt_lo
        cx, cy = sx / w, sy / w
        best, best_a = lo, -1.0
        for j in range(lo, hi):
            a = abs((ax - cx) * (y[j] - ay) - (ax - x[j]) * (ay - cy))
            if a > best_a:
                best, best_a = j, a
        idx.append(best)
    idx.append(n - 1)
    want = sorted((p, pts[i][0]) for p, i in enumerate(idx))
    assert got == want


def test_matrix_profile_planted_motif(spark):
    # sawtooth noise base + the SAME sharp spike shape planted at t=10
    # and t=40: those two windows must be mutual nearest neighbors at
    # distance ~0, and the profile must cover all n-m+1 windows
    import math

    from the_framework_for_clustering_time_series_data_spark.operators.motifs import matrix_profile

    m = 7
    base = [math.sin(0.7 * t) + 0.05 * ((t * 2654435761) % 97) for t in range(60)]
    shape = [5.0, 9.0, 2.0, 8.0, 1.0, 7.0, 3.0]
    for s in (10, 40):
        for k, x in enumerate(shape):
            base[s + k] = x
    rows = [(1, t, float(v)) for t, v in enumerate(base)]
    grid = spark.createDataFrame(rows, "series_id long, bucket long, v_locf double")
    mp = {
        r["idx"]: r
        for r in matrix_profile(grid, m=m, bucket_col="bucket").collect()
    }
    assert len(mp) == 60 - m + 1
    assert mp[10]["nn_idx"] == 40 and mp[40]["nn_idx"] == 10
    assert mp[10]["mp"] < 1e-6 and mp[40]["mp"] < 1e-6
    # a window far from both plants must have a strictly larger profile
    assert mp[25]["mp"] > mp[10]["mp"]


def test_matrix_profile_constant_series_and_short_series(spark):
    from the_framework_for_clustering_time_series_data_spark.operators.motifs import matrix_profile

    rows = [(1, t, 3.0) for t in range(20)] + [(2, t, float(t)) for t in range(8)]
    grid = spark.createDataFrame(rows, "series_id long, bucket long, v_locf double")
    out = matrix_profile(grid, m=7, bucket_col="bucket").collect()
    s1 = [r for r in out if r["series_id"] == 1]
    s2 = [r for r in out if r["series_id"] == 2]
    # constant series: every window pair matches exactly (distance 0)
    assert s1 and all(r["mp"] == 0.0 for r in s1)
    # 8 points, m=7 -> 2 windows, all inside the exclusion zone -> dropped
    assert s2 == []


def test_matrix_profile_summary_plan(spark):
    rows = QUERIES["ts_matrix_profile"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["motif_mp"] <= r["discord_mp"]
        assert r["motif_idx"] != r["motif_nn_idx"]
        assert r["motif_mp"] >= 0.0


def test_sbd_sax_pruned_is_value_identical_subset(spark):
    # the SAX-word pruner must only DROP pairs, never change a surviving
    # pair's (best_lag, ncc_max, sbd); same-word pairs are where the
    # near-shape mass lives, so the subset keeps the pairs that matter
    from the_framework_for_clustering_time_series_data_spark.plans.spectral_plans import _sbd_pairs_frame

    from tests.conftest import SF_ORACLE as sf
    key = lambda r: (r["sid_a"], r["sid_b"])  # noqa: E731
    pruned = {key(r): tuple(r) for r in _sbd_pairs_frame(spark, sf, prune=True).collect()}
    exact = {key(r): tuple(r) for r in _sbd_pairs_frame(spark, sf, prune=False).collect()}
    assert pruned, "pruner produced no pairs at all"
    assert set(pruned) <= set(exact)
    for k, v in pruned.items():
        assert exact[k] == v, (k, v, exact[k])
    # the pruned set must include every STRONG shape match (sbd <= 0.3)
    strong = {k for k, v in exact.items() if v[-1] <= 0.3}
    missed = strong - set(pruned)
    assert len(missed) <= max(1, len(strong) // 5), (
        f"pruner lost {len(missed)}/{len(strong)} strong pairs"
    )


def test_sbd_adaptive_sparse_regime_equals_fixed(spark):
    """At sf0.01 no coarse bucket exceeds _SBD_BUCKET_CAP (max 7
    members), so the adaptive fine screen never engages and the
    adaptive kNN must equal ts_sbd_topk EXACTLY — the sparse-regime
    recall guarantee is equality by construction, not approximation."""
    from tests.conftest import SF_ORACLE as sf

    a = sorted(map(tuple, QUERIES["ts_sbd_topk_adaptive"](spark, sf).collect()))
    b = sorted(map(tuple, QUERIES["ts_sbd_topk"](spark, sf).collect()))
    assert a == b and a


def test_sbd_adaptive_dense_screen_at_sf01(spark):
    """sf0.1 is where the dense branch lives (one 63-member coarse
    bucket > cap 32; the driver's sf0.01 oracle gate never reaches
    it): the shift-tolerant fine screen must (a) strictly cut the
    candidate set, (b) leave every surviving pair's values identical
    to the fixed form's, (c) keep ≥99% of the fixed form's series with
    a top-5, and (d) replay exactly in DuckDB — the dense-branch half
    of the full value-hash oracle."""
    import duckdb

    from tests.conftest import SF_BENCH as sf
    from the_framework_for_clustering_time_series_data_spark.plans.registry import ORACLE
    from the_framework_for_clustering_time_series_data_spark.plans.spectral_plans import (
        _sax_adaptive_candidates,
        _sbd_pairs_frame,
    )
    key = lambda r: (r["sid_a"], r["sid_b"])  # noqa: E731
    fixed = {
        key(r): tuple(r) for r in _sbd_pairs_frame(spark, sf, prune=True).collect()
    }
    adap = {
        key(r): tuple(r)
        for r in _sbd_pairs_frame(
            spark, sf, prune=True, cand_builder=_sax_adaptive_candidates
        ).collect()
    }
    assert set(adap) < set(fixed), "screen should strictly cut candidates"
    assert len(adap) < 0.7 * len(fixed), (
        f"screen barely cut anything: {len(adap)}/{len(fixed)}"
    )
    for k, v in adap.items():
        assert fixed[k] == v, (k, v, fixed[k])

    # the round-11 auto-gate routes sf0.1 (72k dense pairs < 500k
    # threshold) to the FIXED branch: the registered plan must equal
    # ts_sbd_topk here, and its (gated) oracle must agree
    knn = sorted(map(tuple, QUERIES["ts_sbd_topk_adaptive"](spark, sf).collect()))
    fixed_knn = sorted(map(tuple, QUERIES["ts_sbd_topk"](spark, sf).collect()))
    assert knn == fixed_knn
    base_series = {r[0] for r in fixed_knn}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = sorted(map(tuple, con.execute(ORACLE["ts_sbd_topk_adaptive"]).fetchall()))
    assert len(orc) == len(knn)
    for a, b in zip(knn, orc):
        assert a[:3] == b[:3] and abs(a[3] - b[3]) < 1e-9 and a[4] == b[4], (a, b)

    # FORCE the adaptive branch in BOTH engines (gate threshold 1 →
    # use_fixed false at any density) so the dense-branch half of the
    # oracle keeps live cross-engine coverage at sf0.1
    from the_framework_for_clustering_time_series_data_spark.plans.spectral_plans import (
        _SBD_CC_TAIL,
        _SBD_KNN_TAIL_SQL,
        _sbd_adaptive_cand_ctes,
        _sbd_knn_from_pairs,
    )

    knn_a = sorted(
        map(
            tuple,
            _sbd_knn_from_pairs(
                _sbd_pairs_frame(
                    spark, sf, prune=True, cand_builder=_sax_adaptive_candidates
                )
            ).collect(),
        )
    )
    adap_series = {r[0] for r in knn_a}
    assert len(adap_series) >= 0.99 * len(base_series)
    forced_sql = (
        f"WITH {_sbd_adaptive_cand_ctes(1)},\n{_SBD_CC_TAIL},\n{_SBD_KNN_TAIL_SQL}"
    )
    orc_a = sorted(map(tuple, con.execute(forced_sql).fetchall()))
    assert len(orc_a) == len(knn_a)
    for a, b in zip(knn_a, orc_a):
        assert a[:3] == b[:3] and abs(a[3] - b[3]) < 1e-9 and a[4] == b[4], (a, b)
