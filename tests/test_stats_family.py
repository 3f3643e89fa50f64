"""Semantic invariants for the statistics family — properties the
value-hash parity gate cannot express (parity proves Spark==DuckDB;
these prove the STATISTICS are right: coverage, monotonicity,
nonnegativity, completeness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES


def test_kaplan_meier_curve_is_a_survival_function(spark):
    rows = sorted(
        QUERIES["ml_kaplan_meier"](spark, SF_ORACLE).collect(),
        key=lambda r: r["t_h"],
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["surv"] <= prev + 1e-12  # monotone non-increasing in [0,1]
        assert r["d_events"] >= 1 and r["n_risk"] >= r["d_events"]
        prev = r["surv"]


def test_conformal_interval_achieves_nominal_coverage(spark):
    # the split-conformal guarantee is >= 90% on exchangeable data;
    # check empirical coverage of [lo, hi] over the whole table
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    iv = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in QUERIES["ml_conformal_interval"](spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events").where(F.col("value").isNotNull())
    total, covered = 0, 0
    for et, (lo, hi) in iv.items():
        sub = ev.where(F.col("event_type") == et)
        n = sub.count()
        c = sub.where((F.col("value") >= lo) & (F.col("value") <= hi)).count()
        total += n
        covered += c
    assert covered / total >= 0.88  # 0.9 nominal minus finite-sample slack


def test_benford_terms_and_frequencies(spark):
    rows = QUERIES["dq_benford_firstdigit"](spark, SF_ORACLE).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    assert abs(sum(r["freq"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_granger_f_nonnegative_and_complete(spark):
    rows = QUERIES["ts_granger_pairs"](spark, SF_ORACLE).collect()
    # nested OLS: RSS_r >= RSS_u, so F >= 0 up to float dust
    assert len(rows) == 90
    assert min(r["f_stat"] for r in rows) >= -1e-6


def test_logrank_chi2_nonnegative(spark):
    (row,) = QUERIES["ml_logrank_test"](spark, SF_ORACLE).collect()
    assert row["chi2"] >= 0.0
    assert row["sum_d1"] >= 0


def test_cuped_reduces_or_preserves_variance(spark):
    (row,) = QUERIES["ab_cuped_lift"](spark, SF_ORACLE).collect()
    # var_reduction = rho^2 in [0, 1]
    assert 0.0 <= row["var_reduction"] <= 1.0


def test_skyline_members_truly_undominated(spark):
    from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table

    sky = QUERIES["q30_skyline_parts"](spark, SF_ORACLE)
    p = load_table(spark, SF_ORACLE, "part").select("p_retailprice", "p_size")
    dom = sky.alias("s").join(
        p.alias("b"),
        (F.col("b.p_retailprice") <= F.col("s.price"))
        & (F.col("b.p_size") >= F.col("s.size"))
        & (
            (F.col("b.p_retailprice") < F.col("s.price"))
            | (F.col("b.p_size") > F.col("s.size"))
        ),
    )
    assert dom.count() == 0


def test_harmonic_bins_never_overfull(spark):
    rows = QUERIES["pack_harmonic_bins"](spark, SF_ORACLE).collect()
    assert rows
    assert all(r["load_tokens"] <= 256 for r in rows)
    # every class's bins except possibly the last hold exactly k docs
    from collections import defaultdict

    by_k = defaultdict(list)
    for r in rows:
        by_k[r["class_k"]].append(r)
    for k, bins in by_k.items():
        bins.sort(key=lambda r: r["bin_idx"])
        for b in bins[:-1]:
            assert b["n_docs"] == k


def test_ks_statistic_well_formed(spark):
    (row,) = QUERIES["ab_ks_test"](spark, SF_ORACLE).collect()
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["n1"] > 0 and row["n0"] > 0
    # a random hash split of one distribution: D must be small
    # (far below the alpha=0.001 critical value ~1.95*sqrt(2/n))
    crit = 1.95 * (2.0 / min(row["n1"], row["n0"])) ** 0.5
    assert row["ks_d"] < crit
