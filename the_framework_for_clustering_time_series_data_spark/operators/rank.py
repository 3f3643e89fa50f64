"""Exact global ranking/ntile without a single-partition sort.

``ntile(k) OVER (ORDER BY ...)`` — the quantile-segmentation idiom the
reference's silhouette top-k and the RFM/cluster-quartile plans lean on
(app.py:798-806 is the tiny in-driver analogue) — is the classic
scale-killer: Spark plans an unpartitioned window as ``Exchange
SinglePartition`` + one sort of the ENTIRE table on one executor. Fine
for a 1.5k-row dimension at sf0.1; fatal for the 10⁸-row per-customer /
per-series tables a 100 TB corpus produces.

This module computes the *bit-identical* ntile result distributively:

1. **Range buckets from a sketch.** One ``percentile_approx`` aggregate
   over a numeric proxy of the leading sort key yields ~``buckets``
   boundary values (a single sketch row — broadcast). Every row's
   bucket = #boundaries ≤ its proxy, a JVM ``size(filter(...))`` over a
   63-element array. Buckets are contiguous spans of the global order
   by construction (the proxy is monotone in the leading key), so
   bucket boundaries never have to be *accurate* — only order-aligned.
   Sketch error only skews bucket SIZES, never the final rank.
2. **Local rank.** ``row_number`` partitioned by bucket — a parallel
   hash exchange, each partition sorting ~N/buckets rows.
3. **Exact offsets.** Bucket counts aggregate to ≤ buckets×specs rows;
   their prefix sums (a constant-size window) broadcast back. Global
   rank = bucket offset + local rank — exact, independent of where the
   sketch put the boundaries.
4. **Closed-form ntile.** With N = total rows, q = N div k,
   r = N mod k, SQL-standard ntile gives the first r tiles q+1 rows:
   ``tile = (rank-1) div (q+1) + 1`` when ``rank <= r*(q+1)`` else
   ``r + (rank-1-r*(q+1)) div q + 1``. Matches Spark's and DuckDB's
   ntile exactly (ties impossible: callers pass a unique tie-break
   key), so DuckDB oracles keep stating the flat ``ntile() OVER``
   form — the point of the comparison.

Shuffle budget per scored column: one hash exchange of the table on the
bucket key + one broadcast join; all metadata passes reuse the input's
aggregate exchange (Spark exchange reuse), so the input is physically
computed once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# One sketch row of ~buckets doubles is broadcast; rank exactness does
# not depend on sketch accuracy (see module docstring), so a cheap
# sketch is enough.
_SKETCH_ACCURACY = 1000


def with_global_ntiles(
    df: DataFrame,
    n: int,
    specs: list[tuple[str, list[str], Column | None]],
    buckets: int = 64,
) -> DataFrame:
    """Append one exact ``ntile(n) OVER (ORDER BY order_cols)`` column
    per spec, without any unbounded single-partition window.

    ``specs``: ``(out_col, order_cols, lead_proxy)`` triples. The last
    entry of ``order_cols`` must make the ordering a total order (the
    same tie-break discipline the flat ntile form needs for
    determinism). ``lead_proxy`` is a numeric Column strictly monotone
    in ``order_cols[0]`` (None → the column cast to double); it only
    steers bucket placement, never the result. Leading keys must be
    non-null (rank of a null-keyed row is undefined here).
    """
    if not 2 <= buckets <= 4096:
        raise ValueError("buckets must be in [2, 4096]")
    fracs = F.array(*[F.lit(i / buckets) for i in range(1, buckets)])

    base = df
    for i, (_, order_cols, proxy) in enumerate(specs):
        pv = proxy if proxy is not None else F.col(order_cols[0]).cast("double")
        base = base.withColumn(f"_pv{i}", pv.cast("double"))

    # 1. all boundary arrays in ONE aggregate pass (single broadcast row)
    bounds = base.agg(
        *[
            F.percentile_approx(f"_pv{i}", fracs, F.lit(_SKETCH_ACCURACY)).alias(
                f"_bounds{i}"
            )
            for i in range(len(specs))
        ]
    )
    def _le_pv(i: int):
        return lambda b: b <= F.col(f"_pv{i}")

    tagged = base.crossJoin(F.broadcast(bounds))
    for i in range(len(specs)):
        tagged = tagged.withColumn(
            f"_bk{i}", F.size(F.filter(f"_bounds{i}", _le_pv(i)))
        )
    tagged = tagged.drop(*[f"_bounds{i}" for i in range(len(specs))])

    # 2. exact per-bucket counts for every spec in one tiny aggregate
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("_i"), F.col(f"_bk{i}").alias("_bk")
                )
                for i in range(len(specs))
            ]
        )
    )
    hist = (
        tagged.select(pairs.alias("_p"))
        .select("_p._i", "_p._bk")
        .groupBy("_i", "_bk")
        .agg(F.count("*").alias("_bn"))
    )
    w_pre = (
        Window.partitionBy("_i").orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hist.select(
        "_i",
        "_bk",
        F.coalesce(F.sum("_bn").over(w_pre), F.lit(0)).alias("_off"),
        F.sum("_bn").over(Window.partitionBy("_i")).alias("_N"),
    )

    # 3+4. per spec: partitioned local rank + broadcast offsets + formula
    out = tagged
    for i, (out_col, order_cols, _) in enumerate(specs):
        w_in = Window.partitionBy(f"_bk{i}").orderBy(*order_cols)
        off_i = offsets.where(F.col("_i") == i).select(
            F.col("_bk").alias(f"_bk{i}"), "_off", "_N"
        )
        rank = F.col("_off") + F.row_number().over(w_in)
        q = F.floor(F.col("_N") / n)
        rem = F.col("_N") % n
        thr = rem * (q + 1)
        tile = F.when(
            rank <= thr, F.floor((rank - 1) / (q + 1)) + 1
        ).otherwise(rem + F.floor((rank - thr - 1) / q) + 1)
        out = (
            out.join(F.broadcast(off_i), f"_bk{i}")
            .withColumn(out_col, tile.cast("int"))
            .drop("_off", "_N")
        )
    return out.drop(
        *[f"_pv{i}" for i in range(len(specs))],
        *[f"_bk{i}" for i in range(len(specs))],
    )


def with_global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    weight: Column,
    out_col: str,
    proxy: Column,
    buckets: int = 64,
) -> DataFrame:
    """Exact inclusive running sum of ``weight`` over a global order,
    without a single-partition sort — the value-ordered sibling of
    packing.global_running_sum (whose md5-prefix buckets only work
    because its sort key IS the hash; here the order is an arbitrary
    total order, so buckets come from the same percentile sketch as
    :func:`with_global_ntiles`).

    ``order_by``: Column sort expressions forming a total order.
    ``proxy``: numeric column ASCENDING along that order (pass the
    negated leading key for descending orders); steers bucket
    placement only — the sum is exact wherever boundaries land.
    ``weight`` should be integer-typed for bit-exact cross-engine
    totals (the BIGINT micro-unit discipline); doubles work but
    inherit two-level association drift.
    """
    if not 2 <= buckets <= 4096:
        raise ValueError("buckets must be in [2, 4096]")
    fracs = F.array(*[F.lit(i / buckets) for i in range(1, buckets)])
    base = df.withColumn("_pv", proxy.cast("double")).withColumn("_wt", weight)
    bounds = base.agg(
        F.percentile_approx("_pv", fracs, F.lit(_SKETCH_ACCURACY)).alias("_bounds")
    )
    tagged = (
        base.crossJoin(F.broadcast(bounds))
        .withColumn("_bk", F.size(F.filter("_bounds", lambda b: b <= F.col("_pv"))))
        .drop("_bounds")
    )
    btot = tagged.groupBy("_bk").agg(F.sum("_wt").alias("_bt"))
    # this window is unpartitioned BY DESIGN: it covers the <= buckets
    # -row bucket-totals table, bounded whatever the input size; the
    # plan-lock tests recognize the _bk ordering key as the bounded
    # -metadata marker
    w_pre = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = btot.select(
        "_bk", F.coalesce(F.sum("_bt").over(w_pre), F.lit(0)).alias("_off")
    )
    w_in = (
        Window.partitionBy("_bk")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.join(F.broadcast(offsets), "_bk")
        .withColumn(out_col, F.col("_off") + F.sum("_wt").over(w_in))
        .drop("_pv", "_wt", "_bk", "_off")
    )
