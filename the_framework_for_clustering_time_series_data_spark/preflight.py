"""Fail-fast memory preflight for the measured entry points (bench.py,
tools/scale_sweep.py) — round-10 verdict ask #2.

The round-10 third-decade sweep (testdata_sf100, 23 GB parquet) died at
the default 8 GiB driver heap as a SILENT JVM abort: no Python
traceback, no partial JSON — the worst failure mode for a timed
artifact, because a killed sweep loses every row (sweep JSONs are
written at loop end). The same sweep completed at 48 GiB.  That data
point calibrates the rule here: a shuffle-heavy local[N] sweep needs
roughly **2× the on-disk parquet bytes** of its LARGEST input dir as
JVM heap (48 / 23 ≈ 2.1 measured; decompressed columns + shuffle
buffers + execution memory all live in the one local-mode JVM).  The
preflight compares that requirement against the configured heap BEFORE
Spark starts and aborts with a sizing message naming the exact
``SPARK_GRAFT_DRIVER_MEM`` value to set — a 2-second refusal instead of
a dead JVM 40 minutes into a sweep.

On a real cluster the equivalent guard is per-executor
(``spark.executor.memory`` vs the per-task partition bytes), and the
failure is a diagnosable OOM-killed container rather than a silent
driver abort — this module exists because local mode gives NO such
diagnostic.
"""

from __future__ import annotations

import os
from pathlib import Path

#: measured at sf100: 23 GB parquet needed 48 GiB heap (2.1×); 8 GiB
#: (0.35×) died silently. 2.0 is the calibrated requirement.
SHUFFLE_HEAVY_FACTOR = 2.0
#: JVM + codegen + metadata floor — below this even tiny inputs thrash.
HEAP_FLOOR_BYTES = 1 << 30  # 1 GiB


class MemoryPreflightError(SystemExit):
    """Raised (and exits non-zero) when the configured heap cannot hold
    the planned sweep — carries the sizing message as its payload."""


def parse_mem(spec: str) -> int:
    """'8g' / '512m' / '48G' / plain bytes → bytes."""
    s = spec.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def input_parquet_bytes(sf_dir: str) -> int:
    """Total on-disk parquet bytes under ``sf_dir`` (recursive — decade
    dirs hold flat files, stream indexes hold partition trees)."""
    root = Path(sf_dir)
    return sum(
        p.stat().st_size for p in root.rglob("*.parquet") if p.is_file()
    )


def required_heap_bytes(
    input_bytes: int, shuffle_heavy: bool = True
) -> int:
    factor = SHUFFLE_HEAVY_FACTOR if shuffle_heavy else 1.0
    return max(HEAP_FLOOR_BYTES, int(input_bytes * factor))


def memory_preflight(
    sf_dirs: list[str] | tuple[str, ...],
    heap: str | int | None = None,
    shuffle_heavy: bool = True,
    label: str = "run",
) -> int:
    """Abort (raise :class:`MemoryPreflightError`) when the configured
    JVM heap is smaller than the calibrated requirement for the largest
    input dir; return the required bytes otherwise.

    ``heap`` defaults to ``$SPARK_GRAFT_DRIVER_MEM`` (the knob
    session.get_spark feeds to ``spark.driver.memory``), default 8g —
    pass an explicit value in tests.
    """
    if heap is None:
        heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    heap_bytes = heap if isinstance(heap, int) else parse_mem(heap)
    worst_dir, worst_bytes = "", 0
    for d in sf_dirs:
        b = input_parquet_bytes(d)
        if b > worst_bytes:
            worst_dir, worst_bytes = d, b
    need = required_heap_bytes(worst_bytes, shuffle_heavy)
    if heap_bytes < need:
        gib = 1 << 30
        suggest = f"{max(1, -(-need // gib))}g"  # ceil to whole GiB
        raise MemoryPreflightError(
            f"memory preflight REFUSING this {label}: configured JVM heap "
            f"{heap_bytes / gib:.1f} GiB < required {need / gib:.1f} GiB "
            f"(largest input {worst_dir}: {worst_bytes / gib:.2f} GiB parquet "
            f"x {SHUFFLE_HEAVY_FACTOR if shuffle_heavy else 1.0} "
            f"shuffle-heavy factor, calibrated by the sf100 silent-JVM-abort "
            f"at 8g / success at 48g). Set SPARK_GRAFT_DRIVER_MEM={suggest} "
            f"and rerun — an under-heaped local sweep dies as a silent JVM "
            f"abort with no Python traceback, losing the whole artifact."
        )
    return need
