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
