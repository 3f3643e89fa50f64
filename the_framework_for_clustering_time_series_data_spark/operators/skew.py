"""Skew-handling utilities for hot keys at cluster scale.

AQE (`spark.sql.adaptive.skewJoin`, on by default in session.py)
handles most runtime skew; these are the explicit tools for the cases
AQE can't fix: a single group key carrying a large fraction of all rows
in an aggregation, and a broadcast-ineligible join against a table with
a handful of hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase sum/count aggregation with a salt key: phase 1
    aggregates on (keys, salt) — splitting a hot key across ``n_salt``
    reducers — phase 2 merges the partials on the true keys. Result is
    identical to a direct groupBy (sum/count are algebraic); cost is a
    second (tiny, n_salt·|keys|-row) shuffle.

    Map-side partial aggregation already gives this effect when the
    upstream partitioning is random; salting matters when the input
    arrives PRE-PARTITIONED on the hot key (e.g. read back from a
    key-bucketed table), where map-side combine can't spread the load.
    """
    ks = list(keys)
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*ks, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(value_col).alias("_pcnt"),
        )
    )
    return partial.groupBy(*ks).agg(
        F.sum("_psum").alias(f"{value_col}_sum"),
        F.sum("_pcnt").alias(f"{value_col}_count"),
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-safe inner equi-join: the fact side gets a random salt in
    [0, n_salt); the dim side is replicated n_salt times (explode of a
    literal range); the join key becomes (key, salt), so one hot key
    spreads over ``n_salt`` tasks instead of one straggler.

    Use when the dim side is too big to broadcast but small enough that
    ``n_salt``× replication is acceptable (the classic mid-size-dim hot
    key case). Output columns = facts ⨝ dim minus helper columns.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    f = facts.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return f.join(d, [key, "_salt"]).drop("_salt")
