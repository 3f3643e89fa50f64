"""Bounded-corpus contract enforcement + id-dtype derivation for the
exact (driver-collect / broadcast) kernels.

Several exact baselines — ``embedding_cosine_pairs``,
``brute_force_topk``'s query side, the kNN-graph plan — collect a
matrix to the driver and broadcast it. That is the correct physical
strategy for a BOUNDED corpus (one BLAS matmul per Arrow batch), and a
driver OOM at fleet scale. The contract used to live only in
docstrings; ``require_bounded_corpus`` makes it executable: past the
limit the kernel refuses with the name of the ANN route that replaces
it, instead of dying inside ``collect()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Rows the exact kernels will collect/broadcast without complaint.
#: ~1M × 64-dim float64 ≈ 0.5 GB on the driver — the documented safe
#: ceiling; raise per-call when you know the driver can take it.
DEFAULT_MAX_CORPUS_ROWS = 1_000_000


class BoundedCorpusError(ValueError):
    """An exact kernel was asked to driver-collect an unbounded corpus."""


def require_bounded_corpus(
    df: DataFrame,
    *,
    op: str,
    scale_route: str,
    limit: int | None = None,
) -> None:
    """Raise :class:`BoundedCorpusError` when ``df`` exceeds ``limit``
    rows, naming the distributed route to use instead.

    Counts via ``limit(n+1).count()`` so the check stops scanning as
    soon as the bound is provably exceeded — never a full count of a
    100 TB table. NOTE: this is an EAGER Spark action at
    operator-construction time; when ``df`` is a derived, uncached
    pipeline its upstream computes once for the probe and again for
    the real run. Pass ``limit=0`` to skip the probe entirely when the
    input is known-bounded (already counted, or a dimension table).
    """
    if limit == 0:
        return
    limit = DEFAULT_MAX_CORPUS_ROWS if limit is None else limit
    n = df.limit(limit + 1).count()
    if n > limit:
        raise BoundedCorpusError(
            f"{op}: corpus exceeds the bounded-corpus contract "
            f"(> {limit} rows would be collected and broadcast to the "
            f"driver). At this scale use {scale_route}, or pass a larger "
            f"max_corpus_rows if the driver is provisioned for it."
        )


def id_spark_type(df: DataFrame, id_col: str) -> str:
    """The id column's Spark DDL type (``bigint``, ``string``, …) — for
    building output schemas that FOLLOW the input id type instead of
    hard-coding ``long`` (sliding-window series ids are strings)."""
    return df.schema[id_col].dataType.simpleString()
