"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on sf0.001 (per-series summary stats).
queries()     — every implemented operator (SURVEY.md §2 + extensions).
oracle_sql()  — DuckDB-equivalent SQL for the SQL-expressible subset.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

    return QUERIES["flagship_series_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from the_framework_for_clustering_time_series_data_spark.plans.registry import ORACLE

    return dict(ORACLE)
