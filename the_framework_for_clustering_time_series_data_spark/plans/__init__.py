from the_framework_for_clustering_time_series_data_spark.plans.registry import QUERIES, ORACLE, register  # noqa: F401
