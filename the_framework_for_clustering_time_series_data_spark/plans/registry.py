"""Query registry: every implemented operator is registered here as a
(Spark callable, DuckDB oracle SQL) pair consumed by ``__spark_entry__``.

Contract (driver): callable(spark, sf_dir) -> DataFrame; oracle SQL runs
on DuckDB views named after the parquet tables. Column NAMES and rounded
VALUES must match — every computed column is aliased identically on both
sides, and floats are rounded (6 dp) on both sides to absorb
engine-level floating-point drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle SQL) to the
    registry. ``oracle=None`` → non-SQL-expressible op, rows-only check.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Importing the plan modules populates the registry.
from the_framework_for_clustering_time_series_data_spark.plans import timeseries_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import relational_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import dedup_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import similarity_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import text_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import ml_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import extension_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import event_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import resample_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import symbolic_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import packing_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import quality_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import spectral_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import retrieval_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import graph_plans  # noqa: E402,F401
from the_framework_for_clustering_time_series_data_spark.plans import cdc_plans  # noqa: E402,F401
