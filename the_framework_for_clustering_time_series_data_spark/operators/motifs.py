"""Motif discovery: find recurring subsequence shapes across (and
within) series, SAX-pruned and exactly verified.

The matrix-profile family solves this with an O(n²) all-window scan;
at fleet scale the standard trick (Lin et al.; Mueen et al.) is the
one implemented here:

1. symbolize every window (PAA → SAX word over ``word_len`` segments of
   ``seg_len`` points);
2. bucket windows by word — ONLY windows sharing a word are motif
   candidates (equal words ⇒ close in PAA space; the SAX lower bound);
3. exactly verify candidate pairs with the z-normalized Euclidean
   distance on the raw 32-point windows, entirely in JVM array
   expressions (zip_with/aggregate — no Python in the pair loop);
4. keep the best pair per word.

Everything shuffles on (series) then (word); the quadratic term is
bounded per bucket by ``max_per_word`` (hash-ordered cap, like the
MinHash bucket cap). Not SQL-expressible at the driver gate →
rows-only there; tests plant identical subsequences and assert they
verify at distance ~0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BP = (-0.6745, 0.0, 0.6745)  # N(0,1) quartiles, alphabet a-d


def _sym(paa: Column) -> Column:
    return (
        F.when(paa < _BP[0], "a")
        .when(paa < _BP[1], "b")
        .when(paa < _BP[2], "c")
        .otherwise("d")
    )


def verified_motifs(
    series: DataFrame,
    seg_len: int = 8,
    word_len: int = 4,
    max_per_word: int = 50,
    series_col: str = "series_id",
    t_col: str = "t",
    value_col: str = "value",
    cap_hash: str = "xxhash64",
) -> DataFrame:
    """Best exactly-verified motif pair per SAX word.

    ``series`` is long-form ``(series_id, t, value)`` with a dense
    per-series ordinal ``t``. Returns one row per repeated SAX word:
    ``(word, sid_a, w_a, sid_b, w_b, dist)`` where ``w_*`` are window
    start segments and ``dist`` is the z-normalized Euclidean distance
    between the two raw windows (length ``seg_len·word_len``). Same-
    series pairs must not overlap (``|w_a - w_b| ≥ word_len``).

    ``cap_hash`` orders the deterministic per-word candidate cap:
    ``"xxhash64"`` (prod — one JVM op) or ``"md5"`` — the portable
    string family a DuckDB oracle reproduces bit-identically (the
    registered query uses it; same discipline as minhash_lsh_pairs).
    The best-pair selection keys on half-up-6dp-rounded dist (identical
    floor(x*1e6+0.5)/1e6 arithmetic in the oracle) so a <1-ulp
    cross-engine drift in the einsum dot product cannot flip which
    pair wins a word.
    """
    L = seg_len * word_len

    # per-series z-norm (zero-variance series drop)
    wp = Window.partitionBy(series_col)
    mu = F.avg(value_col).over(wp)
    sd = F.stddev_pop(value_col).over(wp)
    z = (
        series.select(
            series_col,
            t_col,
            ((F.col(value_col) - mu) / sd).alias("z"),
            sd.alias("_sd"),
        )
        .where(F.col("_sd") > 0)
        .drop("_sd")
    )

    # SAX word per window start segment w (segments w .. w+word_len-1)
    seg = z.groupBy(
        series_col, F.floor(F.col(t_col) / seg_len).alias("seg")
    ).agg(F.avg("z").alias("paa"), F.count("*").alias("n_pts"))
    ws = Window.partitionBy(series_col).orderBy("seg")
    sym = seg.select(series_col, "seg", "n_pts", _sym(F.col("paa")).alias("sym"))
    words = (
        sym.select(
            series_col,
            F.col("seg").alias("w"),
            F.concat(
                *[F.lead("sym", j).over(ws) if j else F.col("sym") for j in range(word_len)]
            ).alias("word"),
            # a window is complete only if all its segments are full
            F.least(
                *[F.lead("n_pts", j).over(ws) if j else F.col("n_pts") for j in range(word_len)]
            ).alias("_min_pts"),
        )
        .where(F.col("word").isNotNull() & (F.col("_min_pts") == seg_len))
        .drop("_min_pts")
    )

    # raw z-window arrays: each point belongs to ≤ word_len windows
    win_of_t = F.sequence(
        F.greatest(F.lit(0).cast("long"), F.floor(F.col(t_col) / seg_len) - (word_len - 1)),
        F.floor(F.col(t_col) / seg_len),
    )
    pts = z.select(series_col, t_col, "z", F.explode(win_of_t).alias("w"))
    windows = (
        pts.groupBy(series_col, "w")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct(t_col, "z"))), lambda s: s.z
            ).alias("zs")
        )
        .where(F.size("zs") == L)
    )

    cand = words.join(windows, [series_col, "w"])
    # bound the per-word quadratic term, hash-ordered for determinism
    if cap_hash == "md5":
        cap_key = F.md5(
            F.concat_ws(
                ",", F.col(series_col).cast("string"), F.col("w").cast("string")
            )
        )
    else:
        cap_key = F.xxhash64(series_col, F.col("w"))
    wcap = Window.partitionBy("word").orderBy(cap_key, series_col, "w")
    cand = cand.withColumn("_rk", F.row_number().over(wcap)).where(
        F.col("_rk") <= max_per_word
    )

    # z-normalize each WINDOW once (≤ max_per_word · |words| windows —
    # cheap even interpreted), so the pair stage needs only a dot
    # product: for unit-variance zero-mean arrays, Σ(za−zb)² = 2L −
    # 2·⟨za,zb⟩. The per-pair kernel then runs as ONE Arrow-batched
    # vectorized matmul-style einsum instead of an interpreted
    # zip_with/aggregate HOF per pair (the dedup_embedding_cosine
    # lesson: interpreted lambdas cost ~µs per ELEMENT, and the pair
    # stage is |pairs|·L elements — 300k·32 here).
    wm = F.aggregate(F.col("zs"), F.lit(0.0), lambda a_, x: a_ + x) / L
    cand = cand.withColumn("_m", wm)
    wsd = F.sqrt(
        F.aggregate(
            F.col("zs"), F.lit(0.0),
            lambda a_, x: a_ + (x - F.col("_m")) * (x - F.col("_m")),
        )
        / L
    )
    cand = (
        cand.withColumn("_s", wsd)
        .where(F.col("_s") > 0)
        .withColumn(
            "zn",
            F.transform("zs", lambda x: (x - F.col("_m")) / F.col("_s")),
        )
        .drop("zs", "_m", "_s")
    )
    # both sides of the pair self-join read cand — checkpoint so the
    # z-norm → SAX-word → window-assembly → cap chain runs once, not
    # twice (guide §2.4); ≤ max_per_word·|words| rows of L doubles
    from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import stage_checkpoint
    cand = cand.transform(stage_checkpoint, eager=False)

    a = cand.select(
        "word",
        F.col(series_col).alias("sid_a"),
        F.col("w").alias("w_a"),
        F.col("zn").alias("zn_a"),
    )
    b = cand.select(
        "word",
        F.col(series_col).alias("sid_b"),
        F.col("w").alias("w_b"),
        F.col("zn").alias("zn_b"),
    )
    pairs = a.join(b, "word").where(
        (F.col("sid_a") < F.col("sid_b"))
        | (
            (F.col("sid_a") == F.col("sid_b"))
            & (F.col("w_b") >= F.col("w_a") + word_len)
        )
    )

    import numpy as np
    import pandas as pd

    def _znorm_dist_fn(zn_a, zn_b):
        if zn_a.empty:
            return pd.Series([], dtype="float64")
        A = np.stack(zn_a.to_numpy())
        B = np.stack(zn_b.to_numpy())
        d2 = np.maximum(2.0 * L - 2.0 * np.einsum("ij,ij->i", A, B), 0.0)
        return pd.Series(np.sqrt(d2))

    # explicit construction: the module defers pandas/numpy imports to
    # call time, so decorator type hints would be unresolvable strings
    _znorm_dist = F.pandas_udf(_znorm_dist_fn, "double")

    scored = pairs.select(
        "word", "sid_a", "w_a", "sid_b", "w_b",
        _znorm_dist("zn_a", "zn_b").alias("dist"),
    )
    # selection keys on the half-up-6dp round (see docstring)
    top = Window.partitionBy("word").orderBy(
        F.floor(F.col("dist") * 1e6 + 0.5) / 1e6,
        "sid_a", "w_a", "sid_b", "w_b",
    )
    return (
        scored.withColumn("_rn", F.row_number().over(top))
        .where(F.col("_rn") == 1)
        .select(
            "word",
            "sid_a",
            "w_a",
            "sid_b",
            "w_b",
            F.round("dist", 6).alias("dist"),
        )
    )


def matrix_profile(
    grid: DataFrame,
    m: int = 7,
    series_col: str = "series_id",
    bucket_col: str = "bucket",
    value_col: str = "v_locf",
) -> DataFrame:
    """Exact per-series matrix profile (Yeh et al., ICDM'16): for every
    length-``m`` window of a series, the z-normalized Euclidean distance
    to its nearest non-trivial neighbor window IN THE SAME SERIES, plus
    that neighbor's index. Low profile values mark motifs (repeated
    shapes); the maximum marks the top discord (anomaly) — the two
    classic uses.

    Expects a UNIFORM grid (resample.gapfill_locf), like every
    sequential-semantics operator here. Each series is self-contained,
    so the computation is ``applyInPandas`` over the series key — the
    same single-exchange partitioning the rollup/gap-fill chain already
    produced, with the O(w²) window-pair work done as ONE NumPy matmul
    per series inside the Arrow batch (w = n−m+1 windows; w ≈ a few
    hundred for daily grids, so the Gram matrix is tiny). Trivial
    matches are suppressed with the standard ⌈m/2⌉ exclusion zone.
    Degenerate (constant, σ≈0) windows: two constants are a perfect
    match (distance 0); constant-vs-varying is pinned at √(2m), the
    uncorrelated-windows distance, so degenerate windows never fake a
    motif. Series with fewer than m + ⌈m/2⌉ + 1 points drop (no
    non-excluded neighbor exists).

    Oracle-checked at the driver gate: ts_matrix_profile's DuckDB SQL
    replays this kernel pairwise (same association order everywhere
    except the dgemm inner products, whose ≤1-ulp drift is absorbed by
    the 6-dp round of mp AND neutralized for nn_idx by keying the
    neighbor selection on half-up-6dp-rounded d2 with first-index ties
    in BOTH engines; the degenerate pins are exact constants in both
    engines, so their ties break identically by index). Tests also
    plant identical subsequences and assert mutual nearest neighbors
    at distance ≈ 0 (tests/test_symbolic.py).
    """
    import numpy as np
    import pandas as pd

    from the_framework_for_clustering_time_series_data_spark.operators.corpus_guard import id_spark_type

    excl = (m + 1) // 2
    # output id dtype follows the input series column (string ids stay
    # strings — sliding-window series ids are strings)
    sid_t = id_spark_type(grid, series_col)
    out_schema = (
        f"{series_col} {sid_t}, idx int, nn_idx int, mp double"
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        v = pdf[value_col].to_numpy(dtype=float)
        n = len(v)
        w = n - m + 1
        if w < excl + 2:
            return pd.DataFrame(
                {series_col: pd.Series(dtype="int64"),
                 "idx": pd.Series(dtype="int32"),
                 "nn_idx": pd.Series(dtype="int32"),
                 "mp": pd.Series(dtype="float64")}
            )
        # windows as a strided view -> (w, m) matrix
        win = np.lib.stride_tricks.sliding_window_view(v, m)
        mu = win.mean(axis=1)
        sd = win.std(axis=1)
        dot = win @ win.T
        const = sd < 1e-12
        # correlation matrix; guard /0 for constant windows
        sd_safe = np.where(const, 1.0, sd)
        corr = (dot - m * np.outer(mu, mu)) / (m * np.outer(sd_safe, sd_safe))
        d2 = np.clip(2.0 * m * (1.0 - corr), 0.0, 4.0 * m)
        # degenerate-window pinning
        both = np.outer(const, const)
        either = np.logical_xor.outer(const, const)
        d2[both] = 0.0
        d2[either] = 2.0 * m
        # exclusion zone around the diagonal
        ii, jj = np.indices(d2.shape)
        d2[np.abs(ii - jj) < excl] = np.inf
        # neighbor SELECTION keys on half-up-6dp-rounded d2 (identical
        # floor(x*1e6+0.5)/1e6 arithmetic in the DuckDB oracle's ORDER
        # BY): the dgemm inner products can drift <=1 ulp vs the
        # oracle's sequential sums, and an unrounded argmin over two
        # near-equal candidates could flip nn_idx across engines even
        # when mp agrees after rounding. argmin takes the FIRST minimum
        # == ORDER BY key, j ascending. mp itself still derives from
        # the unrounded d2 of the selected neighbor.
        d2r = np.floor(d2 * 1e6 + 0.5) / 1e6
        nn = d2r.argmin(axis=1)
        mp = np.sqrt(d2[np.arange(w), nn])
        sid = pdf[series_col].iloc[0]
        return pd.DataFrame(
            {
                series_col: np.full(w, sid),
                "idx": np.arange(w, dtype="int32"),
                "nn_idx": nn.astype("int32"),
                "mp": np.round(mp, 6),
            }
        )

    from the_framework_for_clustering_time_series_data_spark.operators.grouped import grouped_apply

    # partition-batched: one small matmul per series (grouped.py)
    return grouped_apply(grid, [series_col], profile, out_schema)
