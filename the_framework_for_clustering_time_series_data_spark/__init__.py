"""the_framework_for_clustering_time_series_data_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference time-series clustering
framework (reference: /root/reference/app.py), re-expressed Spark-first.

Data model (SURVEY.md §1.5):
  * primary:  long-form ``(series_id, t, value)`` — explicit time ordinal,
    every stage keyed by ``series_id`` (no positional lineage);
  * interchange: nested ``(series_id, values: array<double>)`` at ML
    boundaries only.

Architecture: declarative DataFrame/SQL plans optimized by Catalyst;
Arrow-vectorized pandas UDFs only where built-ins can't express the
semantics (DTW, UMAP, K-Shape, image encode).
"""

__version__ = "0.1.0"

from the_framework_for_clustering_time_series_data_spark.session import get_spark  # noqa: F401
