"""Text-analysis plans over the ``documents`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from the_framework_for_clustering_time_series_data_spark.operators import text as T
from the_framework_for_clustering_time_series_data_spark.plans.registry import register
from the_framework_for_clustering_time_series_data_spark.sources.tables import load_table


@register(
    "text_token_stats",
    """
WITH t AS (
  SELECT doc_id, length(text) AS n_chars,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
)
SELECT doc_id, n_chars, len(toks) AS n_tokens,
       round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 6) AS avg_token_len
FROM t
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count, char count, mean token length."""
    return T.token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality",
    """
WITH t AS (
  SELECT doc_id, text, length(text) AS n_chars,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / n_chars AS alpha_ratio,
         length(regexp_replace(text, '[^.,;:!?''"]', '', 'g'))::DOUBLE / n_chars AS punct_ratio,
         len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','for','it')))::DOUBLE
           / len(toks) AS stop_ratio,
         len(toks) AS n_tokens
  FROM t
)
SELECT doc_id,
       round(alpha_ratio, 6) AS alpha_ratio,
       round(punct_ratio, 6) AS punct_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.3 + alpha_ratio * 0.4
             + least(stop_ratio * 5, 1.0) * 0.3, 6) AS quality
FROM m
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-style quality gates: alpha/punct/stopword ratios +
    combined score."""
    return T.quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "text_lang_id",
    """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
s AS (
  SELECT doc_id,
    len(list_filter(toks, x -> x IN ('der','die','und','das','von','den','im','ein','mit','des'))) AS de,
    len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','for','it'))) AS en,
    len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','los','del','se','las'))) AS es,
    len(list_filter(toks, x -> x IN ('le','la','de','et','les','des','en','un','du','une'))) AS fr,
    len(list_filter(toks, x -> x IN ('的','是','在','了','和','有','我','他','这','中'))) AS zh
  FROM t
)
SELECT doc_id,
  CASE WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
       WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
       WHEN es >= fr AND es >= zh THEN 'es'
       WHEN fr >= zh THEN 'fr'
       ELSE 'zh' END AS pred_lang,
  greatest(de, en, es, fr, zh) AS stopword_hits
FROM s
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID, ties → lexicographically first
    language."""
    return T.lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
w AS (
  SELECT doc_id,
         [md5(array_to_string(toks[i:i+7], ' '))
          FOR i IN range(1, greatest(len(toks) - 8, 0) + 2)] AS fps
  FROM t
)
SELECT doc_id, list_min(fps) AS min_fp, len(list_distinct(fps)) AS n_distinct_windows
FROM w
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 8-token window fingerprints; min window hash + distinct
    window count (md5 variant so the oracle can reproduce it)."""
    return T.fingerprint(load_table(spark, sf_dir, "documents"), use_md5=True)


@register(
    "text_bpe_tokens",
    """
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(lower(trim(text)), '\\s+')) AS n_words,
         len(regexp_extract_all(lower(trim(text)),
             '''[a-z]{1,2}| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+', 0)) AS n_bpe_tokens
  FROM documents
)
SELECT doc_id, n_words, n_bpe_tokens,
       round(n_bpe_tokens / n_words, 6) AS tokens_per_word
FROM t
""",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting vs whitespace words per document — LLM
    token-budget proxy, all JVM regex (SURVEY north-star text ops)."""
    from the_framework_for_clustering_time_series_data_spark.operators.text import bpe_token_stats

    d = load_table(spark, sf_dir, "documents")
    return bpe_token_stats(d)
