"""Public column-expression library — the engine's reusable scalar /
array functions, all JVM-evaluated (pyspark.sql.functions compositions,
no Python UDFs). Import surface for users composing their own plans:

    from the_framework_for_clustering_time_series_data_spark import functions as SF
    docs.select(SF.cosine(F.col("a"), F.col("b")))

Vector math (over array<double>):
  dot, norm, cosine        — similarity primitives (zip_with/aggregate)
Statistics:
  rms                      — sqrt(mean(x²)) aggregate
Text:
  tokens                   — lowercase whitespace tokenization
  shingles                 — distinct word n-gram shingles
  hashed_shingles          — 64-bit shingle hashes, no string materialization
"""

from __future__ import annotations

from the_framework_for_clustering_time_series_data_spark.operators.dedup import (  # noqa: F401
    _hashed_shingles as hashed_shingles,
    _shingles as shingles,
)
from the_framework_for_clustering_time_series_data_spark.operators.similarity import (  # noqa: F401
    cosine_expr as cosine,
    dot_expr as dot,
    norm_expr as norm,
)
from the_framework_for_clustering_time_series_data_spark.operators.stats import rms  # noqa: F401
from the_framework_for_clustering_time_series_data_spark.operators.text import tokens_expr as tokens  # noqa: F401

__all__ = ["dot", "norm", "cosine", "rms", "tokens", "shingles", "hashed_shingles"]
