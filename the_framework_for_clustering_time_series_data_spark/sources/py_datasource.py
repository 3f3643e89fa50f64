"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic time-series generator, batch + streaming.

Why it exists: the reference's only sources are CSV/XLS uploads
(SURVEY.md §2.1). A Spark-native engine's source surface is pluggable —
this module demonstrates the full modern extension API a user would
implement for any bespoke feed (internal wire format, REST pager,
message bus):

* ``partitions()`` — the generator splits the series-id space into
  ``numPartitions`` shards, so the scan parallelizes like any file
  source (no single-task bottleneck at scale);
* ``pushFilters()`` — series_id equality/range predicates prune shards
  BEFORE generation (the Python-source analogue of parquet row-group
  pruning); unsupported predicates are handed back for Spark to apply;
* ``DataSourceStreamReader`` — the same rows as an offset-tracked
  micro-batch stream (one day per offset unit), giving batch/stream
  parity tests a hermetic source with no files or clocks involved.

Every value is a closed-form integer-modular expression — no RNG, no
floats until one exact division — so any engine can reproduce the
rows bit-for-bit (the driver oracle re-derives them in SQL from
``range()``; tests/test_py_datasource.py pins the closed form).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "synthevents"

# value(sid, t) = ((sid*A + t*B) % P) / P  — exact in any engine
_A = 2654435761
_B = 40503
_P = 100003


def _value(sid: int, t: int) -> float:
    return ((sid * _A + t * _B) % _P) / _P


class _Shard(InputPartition):
    def __init__(self, lo: int, hi: int, days: int):
        self.lo, self.hi, self.days = lo, hi, days


class _DayRange(InputPartition):
    def __init__(self, day_lo: int, day_hi: int, series: int):
        self.day_lo, self.day_hi, self.series = day_lo, day_hi, series


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.series = int(options.get("series", 100))
        self.days = int(options.get("days", 30))
        self.num_partitions = int(options.get("numPartitions", 8))
        # series-id bounds tightened by pushed-down predicates
        self.sid_lo = 0
        self.sid_hi = self.series  # exclusive

    def pushFilters(self, filters):
        """Prune the series-id generation range with any supported
        predicates; yield back the ones we cannot handle (Spark then
        applies them post-scan, same contract as every V2 source)."""
        from pyspark.sql.datasource import EqualTo

        for f in filters:
            name = getattr(f, "attribute", None)
            col = name[0] if isinstance(name, (list, tuple)) else name
            if isinstance(f, EqualTo) and col == "series_id":
                v = int(f.value)
                self.sid_lo = max(self.sid_lo, v)
                self.sid_hi = min(self.sid_hi, v + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.sid_lo, self.sid_hi
        n = max(1, min(self.num_partitions, hi - lo))
        step = max(1, (hi - lo + n - 1) // n)
        return [
            _Shard(s, min(s + step, hi), self.days)
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        for sid in range(partition.lo, partition.hi):
            for t in range(partition.days):
                yield (sid, t, _value(sid, t))


class SynthEventsStreamReader(DataSourceStreamReader):
    """Offset = number of days emitted so far; each micro-batch covers
    the day range (start, end]. All days are declared available at
    once, so ``processAllAvailable``/availableNow drains the source
    deterministically — the hermetic twin of a file-arrival stream."""

    def __init__(self, options):
        self.series = int(options.get("series", 100))
        self.days = int(options.get("days", 30))

    def initialOffset(self):
        return {"day": 0}

    def latestOffset(self):
        return {"day": self.days}

    def partitions(self, start, end):
        return [_DayRange(start["day"], end["day"], self.series)]

    def read(self, partition: _DayRange) -> Iterator[tuple]:
        for t in range(partition.day_lo, partition.day_hi):
            for sid in range(partition.series):
                yield (sid, t, _value(sid, t))

    def commit(self, end):
        pass

    def stop(self):
        pass


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return "series_id bigint, t bigint, value double"

    def reader(self, schema):
        return SynthEventsReader(self.options)

    def streamReader(self, schema):
        return SynthEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source; after this,
    ``spark.read.format("synthevents").option(...).load()`` works."""
    # runtime-settable SQLConf; a reader that implements pushFilters()
    # fails fast unless Python-source pushdown is switched on
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthEventsDataSource)
