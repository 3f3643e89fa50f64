"""CSV time-series ingest (reference S1/S2, /root/reference/app.py:156-175,
1597-1650).

The reference reads an uploaded CSV (encoding euc-kr), casts the value
column to float, and relies on file row order as time. Spark-side we
make the ordinal explicit at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_timeseries_csv(
    spark: SparkSession,
    path: str,
    value_col: str,
    process_col: str | None = None,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Read a CSV into the long-form ``(series_id, t, value)`` model.

    * ``value`` cast to double (reference casts float32 at app.py:160;
      we standardize on double and let the oracle compare at rounded
      precision).
    * rows with null value dropped (P1, app.py:184).
    * no ``process_col`` → single synthetic series "0" (the reference's
      sliding-window path then splits it, app.py:1783-1794).
    * ``t`` = 0-based ingest order within series. For a single local
      file this matches file order; on a cluster, order within a series
      is whatever the source provides — callers needing exact file order
      should supply an explicit time column instead.
    """
    if encoding.lower() not in (
        "iso-8859-1", "us-ascii", "utf-16", "utf-16be", "utf-16le", "utf-32", "utf-8",
    ):
        # Spark 4 restricts CSV charsets to a short allow-list; the
        # reference's euc-kr (app.py:159) needs the full JVM charset
        # set back
        spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    raw = (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .csv(path)
    )
    return to_long_form(raw, value_col, process_col)


def to_long_form(
    raw: DataFrame, value_col: str, process_col: str | None = None
) -> DataFrame:
    """Normalize any raw wide table to the long-form
    ``(series_id, t, value)`` model (shared by the CSV/Excel sources)."""
    raw = raw.withColumn("_file_order", F.monotonically_increasing_id())
    series = F.col(process_col).cast("string") if process_col else F.lit("0")
    df = (
        raw.where(F.col(value_col).isNotNull())
        .select(
            series.alias("series_id"),
            F.col("_file_order"),
            F.col(value_col).cast("double").alias("value"),
        )
        .where(F.col("value").isNotNull())
    )
    w = Window.partitionBy("series_id").orderBy("_file_order")
    return df.select(
        "series_id",
        (F.row_number().over(w) - F.lit(1)).alias("t"),
        "value",
    )


def read_timeseries_excel(
    spark: SparkSession,
    path: str,
    value_col: str,
    process_col: str | None = None,
    sheet_name: int | str = 0,
) -> DataFrame:
    """Excel ingest (reference S2 xls branch, app.py:1620-1625: driver-
    side ``pd.read_excel``). Excel files are small by construction
    (single-file uploads), so a driver-side parse + createDataFrame is
    the honest scale story; big data arrives as CSV/parquet instead.
    Requires openpyxl (import-gated)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "read_timeseries_excel needs the public 'openpyxl' package "
            "(pandas read_excel engine); ingest via CSV/parquet instead."
        ) from e
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet_name)
    return to_long_form(spark.createDataFrame(pdf), value_col, process_col)
