"""Deterministic sequence packing: lay documents out in md5(id) order,
concatenate their token counts, and cut the stream into fixed-budget
chunks — without ever building a single-partition global window.

The global inclusive running sum is two-level:

1. every row gets a 256-way RANGE bucket = its sort key's first two hex
   chars (hex order == lexicographic order, so each bucket is a
   contiguous span of the global order);
2. per-bucket totals cumulate in one tiny window (≤256 rows, constant
   in corpus size) to give each bucket its start offset;
3. the offsets broadcast back and a per-bucket window finishes the sum.

One exchange on the bucket key + one broadcast join; holds at any
corpus size. The flat single-window formulation (what the DuckDB
oracle states) is the semantic spec this is validated against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from the_framework_for_clustering_time_series_data_spark.functions.plan_tools import tiny_window


def sort_key(id_col: str) -> Column:
    """Engine-reproducible global ordering key: md5 of the id string."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def global_running_sum(
    df: DataFrame, id_col: str, weight_col: str, out_col: str = "cum"
) -> DataFrame:
    """Inclusive running sum of ``weight_col`` over the global
    md5(id)-order, via the two-level bucket scan described above.
    Adds ``out_col``; drops nothing."""
    sk = sort_key(id_col)
    base = df.withColumn("_sk", sk).withColumn("_bk", F.substring(sk, 1, 2))
    btot = base.groupBy("_bk").agg(F.sum(weight_col).alias("_btot"))
    w_b = tiny_window("_bk", key="_bk").rowsBetween(Window.unboundedPreceding, 0)
    offsets = btot.select(
        "_bk", (F.sum("_btot").over(w_b) - F.col("_btot")).alias("_offset")
    )
    w_in = (
        Window.partitionBy("_bk")
        .orderBy("_sk", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), "_bk")
        .withColumn(out_col, F.col("_offset") + F.sum(weight_col).over(w_in))
        .drop("_sk", "_bk", "_offset")
    )


def pack_chunks(
    df: DataFrame, id_col: str, tokens_col: str, chunk: int
) -> DataFrame:
    """Concatenate-and-chunk packing: returns (id, tokens, first_chunk,
    chunks_spanned) — which fixed-``chunk``-token training block each
    document's first token lands in and how many blocks it straddles."""
    packed = global_running_sum(df, id_col, tokens_col)
    first = F.floor((F.col("cum") - F.col(tokens_col)) / chunk)
    last = F.floor((F.col("cum") - 1) / chunk)
    return packed.select(
        id_col,
        tokens_col,
        first.alias("first_chunk"),
        (last - first + 1).alias("chunks_spanned"),
    )
