"""Scalar statistics operators (reference A1-A4,
/root/reference/app.py:1037-1048, 1706-1710) and per-series length
statistics (G2, app.py:221-232).

All pure built-in aggregates: map-side partial aggregation, single
shuffle on the grouping key (or none for global aggs), whole-stage
codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rms(col) -> "F.Column":
    """A2 — root-mean-square, sqrt(mean(x^2)) (app.py:1037-1048)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(F.avg(F.pow(c, F.lit(2))))


def value_stats(df: DataFrame, value_col: str = "value") -> DataFrame:
    """A1 — the stats panel: min, max, mean, population variance, RMS
    (app.py:1706-1710; note np.var ddof=0 → ``var_pop``).
    """
    v = F.col(value_col)
    return df.agg(
        F.round(F.min(v), 6).alias("v_min"),
        F.round(F.max(v), 6).alias("v_max"),
        F.round(F.avg(v), 6).alias("v_mean"),
        F.round(F.var_pop(v), 6).alias("v_var"),
        F.round(rms(v), 6).alias("v_rms"),
    )


def series_lengths(df: DataFrame) -> DataFrame:
    """Per-series point count over long form — the grouped-length table
    feeding G2/G3/G4.
    """
    return df.groupBy("series_id").agg(F.count("*").alias("length"))


def length_stats(df: DataFrame) -> DataFrame:
    """G2 — min/max/mean of per-series lengths (app.py:221-232)."""
    return series_lengths(df).agg(
        F.min("length").alias("len_min"),
        F.max("length").alias("len_max"),
        F.round(F.avg("length"), 6).alias("len_mean"),
        F.count("*").alias("n_series"),
    )


# --------------------------------------------------------------------------
# Deterministic resampling / robust-trend kernels (shared by the
# registered plans and the 5M-row scale smokes)
# --------------------------------------------------------------------------

#: integer thresholds for the Poisson(1) CDF on a 28-bit uniform,
#: k = 0..3 (weights cap at 4). NORMATIVE VALUES: computed as
#: int(float(P(X<=k)) * 2**28) in IEEE DOUBLE — i.e. from math.exp(-1),
#: not from the exact rational CDF. Do not re-derive with exact
#: arithmetic: these literals ARE the definition both engines compare
#: against (placement error ~4e-9 per threshold is statistically
#: irrelevant; bit equality of the table is what parity needs). 28
#: bits = 7 hex chars, so ONE md5 yields FOUR independent uniforms
#: (chars 1-7, 8-14, 15-21, 22-28 of the 32-char digest) — the
#: hash-budget layout poisson_bootstrap_moments exploits.
POISSON_T28 = (
    98751885,
    197503771,
    246879713,
    263338361,
)


def poisson_bootstrap_moments(
    df: DataFrame,
    key_cols: list,
    value_cents_col: str,
    id_col: str,
    reps: int = 32,
) -> DataFrame:
    """Single-pass Poisson-bootstrap replicate moments: every row joins
    each replicate with an md5-deterministic Poisson(1) weight and one
    map-side-combined aggregate emits ``(key..., rep, s, n)``: the
    weighted cent-sum and weight-count per replicate. Replicate mean =
    s/n/100. The row blow-up (× reps) lives only in the map stage; the
    shuffle carries key × rep partials.

    Hash budget + codegen discipline: each digest is chopped into FOUR
    independent 28-bit uniforms (7 hex chars each, vs the POISSON_T28
    integer-CDF table), so replicate rep reads chunk rep%4 of
    md5(id:rep//4) — reps/4 hashes per row. Round-12 kernel (guide
    §2.3 — aggregate before you shuffle; §1.2 — fix the per-task
    work): NO row explosion at all. The digests are projected once per
    row and every replicate becomes its own pair of FLAT aggregate
    expressions (s_r = Σ w_r·v, n_r = Σ w_r), so the map stage pushes
    n rows through one 2·reps-column hash aggregate instead of n×reps
    exploded rows through per-row group lookups; the per-key result
    (reps structs wide) is then unpivoted to the same ``(key..., rep,
    s, n)`` rows. History: a transform() lambda form ran the md5
    chunking INTERPRETED (higher-order-function lambdas evaluate
    outside codegen, 25% slower than the 32-md5 original); the r7
    two-level posexplode measured 4.8 s → 3.0 s at sf0.1; this
    explode-free form measures 3.0 → ~1.3 s steady and shrinks the
    map-output rows ×reps. Values are identical: the same md5-chunk
    weights feed the same exact integer sums, just accumulated
    per-column instead of per-exploded-row."""
    blocks = (reps + 3) // 4
    r1 = df.select(
        *key_cols,
        F.col(value_cents_col),
        *[
            F.md5(F.concat_ws(":", F.col(id_col), F.lit(b)).cast("binary")).alias(
                f"_h{b}"
            )
            for b in range(blocks)
        ],
    )

    # The 2·reps aggregate expressions and the reps-struct unpivot are
    # built as SQL STRINGS parsed JVM-side in ONE py4j call each
    # (round-13, guide §7.3 — plan-construction time IS driver time):
    # the Column-by-Column form made ~9.6k py4j round trips (~300
    # expression objects × ~30 calls), 2.7-12.6 s of timed driver
    # chatter per run at any scale factor. The parsed trees are the
    # SAME Catalyst expressions (CASE WHEN ↔ F.when, integer literals,
    # identical coercions), so every value is unchanged.
    t28 = POISSON_T28

    def w_sql(rep: int) -> str:
        u = (
            f"CAST(conv(substring(_h{rep // 4}, {1 + 7 * (rep % 4)}, 7), "
            "16, 10) AS BIGINT)"
        )
        return (
            f"(CASE WHEN {u} < {t28[0]} THEN 0 WHEN {u} < {t28[1]} THEN 1 "
            f"WHEN {u} < {t28[2]} THEN 2 WHEN {u} < {t28[3]} THEN 3 "
            "ELSE 4 END)"
        )

    aggs = []
    for rep in range(reps):
        w = w_sql(rep)
        aggs.append(
            F.expr(f"sum({w} * `{value_cents_col}`)").alias(f"_s{rep}")
        )
        aggs.append(F.expr(f"sum({w})").alias(f"_n{rep}"))
    g = r1.groupBy(*key_cols).agg(*aggs)
    structs = ",".join(
        f"named_struct('rep', CAST({rep} AS INT), 's', _s{rep}, 'n', _n{rep})"
        for rep in range(reps)
    )
    return g.select(
        *key_cols,
        F.expr(f"explode(array({structs}))").alias("_r"),
    ).select(*key_cols, "_r.rep", "_r.s", "_r.n")


def theilsen_mk(series: DataFrame) -> DataFrame:
    """Robust trend panel over long-form ``(series_id, t, value)``:
    Theil-Sen lower-median pairwise slope ((slope, t_i, t_j)-pinned
    selection) + Mann-Kendall exact integer S and continuity-corrected
    z (no-ties variance form). Pair generation is an equi-join on
    series_id — n² per KEY, parallel across keys, never a global
    product."""
    from pyspark.sql.window import Window

    a = series.select("series_id", F.col("t").alias("ti"), F.col("value").alias("va"))
    b = series.select("series_id", F.col("t").alias("tj"), F.col("value").alias("vb"))
    pr = a.join(b, "series_id").where(F.col("tj") > F.col("ti")).select(
        "series_id",
        ((F.col("vb") - F.col("va")) / (F.col("tj") - F.col("ti")).cast("double")).alias(
            "slope"
        ),
        F.when(F.col("vb") > F.col("va"), 1)
        .when(F.col("vb") < F.col("va"), -1)
        .otherwise(0)
        .alias("sgn"),
        "ti",
        "tj",
    )
    wroworder = Window.partitionBy("series_id").orderBy("slope", "ti", "tj")
    wcnt = Window.partitionBy("series_id")
    med = (
        pr.withColumn("rn", F.row_number().over(wroworder))
        .withColumn("np", F.count("*").over(wcnt))
        .where(F.col("rn") == F.floor((F.col("np") + 1) / 2))
        .select("series_id", F.col("slope").alias("ts_slope"))
    )
    mk = pr.groupBy("series_id").agg(F.sum("sgn").cast("long").alias("mk_s"))
    nn = series.groupBy("series_id").agg(F.count("*").alias("n"))
    var_sqrt = F.sqrt(F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0)
    z = (
        F.when(F.col("mk_s") > 0, (F.col("mk_s") - 1) / var_sqrt)
        .when(F.col("mk_s") < 0, (F.col("mk_s") + 1) / var_sqrt)
        .otherwise(0.0)
    )
    return (
        nn.join(med, "series_id")
        .join(mk, "series_id")
        .select(
            "series_id",
            "n",
            F.round("ts_slope", 6).alias("ts_slope"),
            "mk_s",
            F.round(z, 6).alias("mk_z"),
        )
    )


#: PSI drift-monitor constants shared by the batch plan
#: (plans/quality_plans.dq_psi_value_drift), its DuckDB oracle, and
#: the streaming twin (streaming/ops.streaming_psi_bin_counts) — one
#: definition so the three can never drift apart.
PSI_CUTOFF = "2024-01-16"
PSI_N_BINS = 10
PSI_BIN_WIDTH = 10.0


def psi_period_expr(ts_col: str = "ts") -> "F.Column":
    """Period label for the PSI before/after split: 'a' before the
    cutoff, 'b' from it on."""
    return (
        F.when(F.col(ts_col) < F.lit(PSI_CUTOFF).cast("timestamp"), "a")
        .otherwise("b")
    )


def psi_bin_counts(
    df: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """The PSI monitor's BUILD pass: per (type, bin) counts of the two
    periods — ``(event_type, bin, na, nb)``. Counts are associative
    and mergeable, and the key space is fixed (types × 10 clamped
    decile bins), so this is exactly the bounded-state aggregate a
    streaming monitor maintains incrementally (the d3/HLL pattern);
    one shuffle with map-side partials in batch."""
    e = df.where(F.col(value_col).isNotNull()).select(
        type_col,
        psi_period_expr(ts_col).alias("period"),
        F.greatest(
            F.least(F.floor(F.col(value_col) / PSI_BIN_WIDTH), F.lit(PSI_N_BINS - 1)),
            F.lit(0),
        )
        .cast("int")
        .alias("bin"),
    )
    return e.groupBy(type_col, "bin").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("nb"),
    )


def psi_from_bin_counts(c: DataFrame, type_col: str = "event_type") -> DataFrame:
    """The PSI monitor's FOLD: Laplace-smoothed proportions
    (n+0.5)/(N+5) per bin, PSI = Σ (p_b − p_a)·ln(p_b/p_a), each term
    quantized to an exact pico-unit int64 before the association-
    order-proof integer sum (the c7b discipline). Input is the bounded
    bin-count table, so this costs one broadcast-size totals join and
    a 10-term reduce per type wherever it runs — including over a
    streamed snapshot of the counts."""
    t = c.groupBy(type_col).agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    j = c.join(t, type_col)
    pa = (F.col("na").cast("double") + 0.5) / (F.col("ta").cast("double") + 5)
    pb = (F.col("nb").cast("double") + 0.5) / (F.col("tb").cast("double") + 5)
    term = F.floor((pb - pa) * F.log(pb / pa) * 1e12 + 0.5)
    q = j.select(type_col, "ta", "tb", term.alias("term"))
    return q.groupBy(
        type_col,
        F.col("ta").cast("long").alias("n_a"),
        F.col("tb").cast("long").alias("n_b"),
    ).agg(
        (
            F.floor(F.sum(F.col("term").cast("long")).cast("double") / 1e6 + 0.5)
            / 1e6
        ).alias("psi")
    )
