"""Memory preflight (round-10 verdict ask #2): the measured entry
points must REFUSE with a sizing message when the configured JVM heap
cannot hold the planned input — instead of dying 40 minutes in as the
silent JVM abort the sf100 sweep hit at the 8g default."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from the_framework_for_clustering_time_series_data_spark.preflight import (
    HEAP_FLOOR_BYTES,
    MemoryPreflightError,
    input_parquet_bytes,
    memory_preflight,
    parse_mem,
    required_heap_bytes,
)


def test_parse_mem_units():
    assert parse_mem("8g") == 8 << 30
    assert parse_mem("512m") == 512 << 20
    assert parse_mem("48G") == 48 << 30
    assert parse_mem("1.5g") == int(1.5 * (1 << 30))
    assert parse_mem("1048576") == 1 << 20


def test_fake_low_heap_refuses_with_sizing_message():
    # SF_SMALL holds real parquet; a sub-floor heap must refuse and the
    # message must name the exact env var + a concrete value to set
    with pytest.raises(MemoryPreflightError) as ex:
        memory_preflight([SF_SMALL], heap="64m", label="unit test")
    msg = str(ex.value)
    assert "REFUSING" in msg and "SPARK_GRAFT_DRIVER_MEM=" in msg
    assert "unit test" in msg
    # MemoryPreflightError IS a SystemExit: an entry point that doesn't
    # catch it exits non-zero instead of starting a doomed JVM
    assert isinstance(ex.value, SystemExit)


def test_adequate_heap_passes_and_returns_requirement():
    need = memory_preflight([SF_SMALL], heap="8g")
    assert need == required_heap_bytes(input_parquet_bytes(SF_SMALL))
    # small dirs bottom out at the floor, never at zero
    assert need == HEAP_FLOOR_BYTES


def test_sf100_calibration_point():
    # the measured round-10 data point: 23 GB parquet died at 8g,
    # completed at 48g — the factor must refuse 8g and accept 48g
    sf100_bytes = 23 << 30
    need = required_heap_bytes(sf100_bytes, shuffle_heavy=True)
    assert parse_mem("8g") < need <= parse_mem("48g")


def test_largest_dir_governs(tmp_path):
    small = tmp_path / "small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    # pairing a tiny dir with SF_SMALL must size for SF_SMALL
    need_pair = memory_preflight([str(small), SF_SMALL], heap="8g")
    need_small = memory_preflight([str(small)], heap="8g")
    assert need_pair >= need_small
