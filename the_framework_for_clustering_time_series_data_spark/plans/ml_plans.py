"""ML plans (embedding / clustering / DTW) — rows-only oracle checks
where noted (SURVEY.md §5.2). Populated as phases 2-3 land."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from the_framework_for_clustering_time_series_data_spark.operators import align
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import events_as_series


@register("g6_dtw_align")  # pandas-UDF DTW → rows-only oracle
def g6_dtw_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 — DTW stretch-alignment of every series to the longest one
    (app.py:300-350), exact O(n·m) DTW in applyInPandas."""
    return align.dtw_stretch_align(events_as_series(spark, sf_dir))
