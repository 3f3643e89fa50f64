from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    import os

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # VANILLA session — builder defaults only, the driver's session
        # shape (round-9 verdict ask #8): lets any suite re-run under
        # the exact config surface the driver uses, so pinned-config
        # dependencies (parquet nanosAsLong, UTC tz, arrow) surface as
        # failures here instead of only in driver rounds. Used by
        # tools/vanilla_parity.py --twin-bounds to exercise every
        # rows-only query's twin-bound invariant vanilla.
        from pyspark.sql import SparkSession

        s = (
            SparkSession.builder.master("local[8]")
            .appName("the_framework_for_clustering_time_series_data_spark-tests-vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        yield s
        s.stop()
        return
    from the_framework_for_clustering_time_series_data_spark.session import get_spark

    s = get_spark("the_framework_for_clustering_time_series_data_spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
