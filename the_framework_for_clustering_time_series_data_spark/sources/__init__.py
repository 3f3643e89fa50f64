from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table, load_tables, events_as_series  # noqa: F401
from the_framework_for_clustering_time_series_data_spark.sources.csv_source import read_timeseries_csv  # noqa: F401
