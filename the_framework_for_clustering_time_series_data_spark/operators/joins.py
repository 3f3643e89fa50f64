"""Time-series join operators Spark lacks as builtins: as-of join,
range (interval) join, gap-based sessionization.

The reference has no explicit joins at all (SURVEY.md §2.9 — its join
semantics are positional-array lineage, /root/reference/app.py:958-1034);
these are the Spark-first generalizations a time-series/events engine
needs, built so each costs exactly ONE hash shuffle on the series key:

  * as-of join — union-tag + window ``last(ignorenulls)``: never a
    per-row subquery, never a theta join; cost = one shuffle of
    |probe| + |build| rows on the key.
  * range join — interval bucketization: intervals explode onto the
    fixed-width time buckets they cover, events map to their single
    bucket, and the match is an equi-join on (key, bucket) + an exact
    range filter. Catalyst sees a plain equi-join (AQE/skew handling
    apply); cost scales with interval_width/bucket_width, not |L|·|R|.
  * sessionize — two stacked windows over the same (key, ts) sort:
    lag-gap flag, then running sum → session ids; Spark executes both
    in one shuffle + one sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_cols: Sequence[str],
    probe_ts: str = "ts",
    build_ts: str = "ts",
    payload_cols: Sequence[str] = ("value",),
    seq_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every probe row, attach the payload of the matching build row
    with the same key: the latest with ``build.ts <= probe.ts``
    (``direction="backward"``, inclusive — the default and the kdb/
    pandas ``merge_asof`` convention), the earliest with ``build.ts >=
    probe.ts`` (``"forward"``), or whichever of the two is closer in
    time (``"nearest"``, ties to backward). Probe rows with no match
    keep null payloads.

    Plan: tag build rows ``_side=0`` / probe rows ``_side=1``, union,
    and take ``last(payload, ignorenulls=True)`` over a window
    partitioned by key and ordered by ``(ts, _side, seq)`` with an
    unbounded-preceding frame; forward uses the mirrored (descending)
    ordering, nearest evaluates both frames over the SAME exchange (two
    Window sorts, one shuffle) and picks per row by time distance.
    Equal timestamps sort build-before-probe (inclusive semantics);
    ``seq_col`` breaks ties among equal build timestamps
    deterministically (backward: highest seq wins; forward: lowest).

    One shuffle on the key; no join node at all — survives 100× scale
    as long as single-key history fits a partition (it shuffles rows,
    never materializes per-key arrays).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    keys = list(key_cols)
    payloads = list(payload_cols)
    seq = seq_col or build_ts

    b = build.select(
        *keys,
        F.col(build_ts).alias("_ts"),
        F.col(seq).alias("_seq"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payloads],
        *[F.lit(None).alias(f"_probe_{c}") for c in probe.columns],
    )
    p = probe.select(
        *keys,
        F.col(probe_ts).alias("_ts"),
        F.lit(None).cast(b.schema["_seq"].dataType).alias("_seq"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"_p_{c}") for c in payloads],
        *[F.col(c).alias(f"_probe_{c}") for c in probe.columns],
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_seq").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").desc(), F.col("_side"), F.col("_seq").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = b.unionByName(p)

    def picks(w, tag: str) -> list:
        cols = [
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(f"{tag}_{c}")
            for c in payloads
        ]
        cols.append(
            F.last(
                F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
            ).over(w).alias(f"{tag}_ts")
        )
        return cols

    if direction == "backward":
        matched = unioned.select(
            *keys,
            "_side",
            *[F.col(f"_probe_{c}") for c in probe.columns],
            *picks(wb, "asof"),
        )
    elif direction == "forward":
        matched = unioned.select(
            *keys,
            "_side",
            *[F.col(f"_probe_{c}") for c in probe.columns],
            *picks(wf, "asof"),
        )
    else:  # nearest: both frames share one exchange, then per-row choice
        both = unioned.select(
            *keys,
            "_side",
            "_ts",
            *[F.col(f"_probe_{c}") for c in probe.columns],
            *picks(wb, "_b"),
            *picks(wf, "_f"),
        )
        b_ts, f_ts = F.col("_b_ts"), F.col("_f_ts")
        use_b = f_ts.isNull() | (
            b_ts.isNotNull()
            & (
                (F.unix_micros(F.col("_ts")) - F.unix_micros(b_ts))
                <= (F.unix_micros(f_ts) - F.unix_micros(F.col("_ts")))
            )
        )
        matched = both.select(
            *keys,
            "_side",
            *[F.col(f"_probe_{c}") for c in probe.columns],
            *[
                F.when(use_b, F.col(f"_b_{c}"))
                .otherwise(F.col(f"_f_{c}"))
                .alias(f"asof_{c}")
                for c in payloads
            ],
            F.when(use_b, b_ts).otherwise(f_ts).alias("asof_ts"),
        )
    out_probe = [
        F.col(f"_probe_{c}").alias(c) for c in probe.columns if c not in keys
    ]
    return matched.where(F.col("_side") == 1).select(
        *keys, *out_probe, *[f"asof_{c}" for c in payloads], "asof_ts"
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[str],
    event_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int = 3600,
) -> DataFrame:
    """Inner-join events to intervals of the same key with
    ``start < event_ts <= end`` (start-exclusive, end-inclusive), via
    time-bucket equi-join.

    ``intervals`` explodes onto every ``bucket_width``-second bucket its
    span covers; events map to exactly one bucket; the join is an
    equi-join on (key, bucket) followed by the exact range predicate.
    Timestamps are compared as epoch seconds. Output: all interval
    columns + all non-key event columns.
    """
    keys = list(key_cols)
    st_s = F.unix_timestamp(F.col(start_col))
    en_s = F.unix_timestamp(F.col(end_col))

    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(st_s / bucket_width), F.floor(en_s / bucket_width)
            )
        ),
    )
    # rename EVERY event column (both sides may share lineage — e.g.
    # intervals derived from the same scan — so qualified refs would be
    # ambiguous; a full rename sidesteps self-join ambiguity entirely)
    ev = events.select(
        *[F.col(c).alias(f"_e_{c}") for c in events.columns]
    ).withColumn(
        "_e_s", F.unix_timestamp(F.col(f"_e_{event_ts}"))
    ).withColumn("_e_bucket", F.floor(F.col("_e_s") / bucket_width))
    cond = [F.col(k) == F.col(f"_e_{k}") for k in keys] + [
        F.col("_bucket") == F.col("_e_bucket")
    ]
    joined = iv.join(ev, cond).where(
        (F.col("_e_s") > st_s) & (F.col("_e_s") <= en_s)
    )
    return joined.select(
        *[F.col(c) for c in intervals.columns],
        *[
            F.col(f"_e_{c}").alias(c)
            for c in events.columns
            if c not in keys
        ],
    )


def sessionize(
    events: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    seq_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event of the same key exceeds ``gap_seconds``.
    Adds a ``session_id`` column (0-based per key, in time order).

    Two windows over one (key, ts, seq) sort — Spark plans a single
    shuffle + sort, then evaluates lag and the running sum in the same
    window stage.
    """
    keys = list(key_cols)
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(F.col(ts_col)).over(w)
    )
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    running = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn(
        "session_id", F.sum(is_new).over(running) - F.lit(1)
    )


def session_stats(
    events: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    seq_col: str | None = None,
) -> DataFrame:
    """Session summary table: one row per (key, session_id) with event
    count, epoch start/end, and duration seconds."""
    keys = list(key_cols)
    es = F.unix_timestamp(F.col(ts_col))
    s = sessionize(events, keys, ts_col, gap_seconds, seq_col)
    return (
        s.groupBy(*keys, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(es).alias("sess_start"),
            F.max(es).alias("sess_end"),
            (F.max(es) - F.min(es)).alias("duration_s"),
        )
    )
