"""Parquet table sources over the driver test data.

All reads are plain ``spark.read.parquet`` scans so Catalyst gets full
predicate pushdown / column pruning / partition pruning. At cluster
scale the same call reads a partitioned table; nothing here assumes
local files beyond the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables that stay constant-size at EVERY scale factor and are always
# safe to broadcast-hint. supplier/customer/part grow with SF — their
# join strategy belongs to Catalyst statistics + AQE, never a hint.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ensure reader confs even on externally-built sessions
        # (runtime-settable SQLConf; harmless if already set). UTC session
        # tz makes Spark's naive-timestamp arithmetic (unix_timestamp,
        # window()) agree with DuckDB's epoch() on the same parquet.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", _events_ts_as_timestamp(df))
    return df


def _events_ts_as_timestamp(events: DataFrame):
    """Normalize ``events.ts`` to TimestampType across testdata layouts:
    TIMESTAMP(NANOS) read as long nanos (legacy conf) → floor to µs, the
    same truncation DuckDB applies on ns→µs; native parquet timestamp[us]
    (read as TIMESTAMP_NTZ) → plain cast. Every downstream op sees one
    type regardless of which layout the scan hit."""
    from pyspark.sql.types import LongType

    if isinstance(events.schema["ts"].dataType, LongType):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def events_as_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``events`` table viewed as the reference's grouped time-series
    input (SURVEY.md §1.5): ``series_id`` = user_id, explicit time ordinal
    ``t`` = rank of ``ts`` within the series, ``value`` = value.

    Replaces the reference's implicit-row-order semantics
    (/root/reference/app.py:204-217) with an explicit, deterministic
    ordinal — Spark has no stable row order, so ``t`` is derived from the
    event timestamp (tie-broken by event_id).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    # Alias BEFORE the ordinal window: downstream windows/groupBys key
    # on series_id, and if the window here partitioned on user_id the
    # alias would be a NEW attribute — Catalyst would not recognize the
    # existing hashpartitioning and every consumer would pay a second
    # exchange (the ts_ewma pitfall, generalized).
    base = ev.select(
        F.col("user_id").alias("series_id"),
        "ts",
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    w = Window.partitionBy("series_id").orderBy("ts", "event_id")
    return base.select(
        "series_id",
        (F.row_number().over(w) - F.lit(1)).alias("t"),
        "value",
    )
