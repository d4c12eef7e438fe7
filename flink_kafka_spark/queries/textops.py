"""Text-analysis query family (engine extension) on `documents`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import (
    LANG_MARKERS,
    TOKEN_REGEX,
    fingerprint,
    language_id,
    quality_score,
    token_count_bpe,
    token_stats,
)
from ..tables import load
from . import Query


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load(spark, sf_dir, "documents"))


TEXT_STATS_ORACLE = """
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(text), '\\s+') AS ws,
         length(text) AS n_chars_calc
  FROM documents
)
SELECT doc_id,
       len(ws) AS n_tokens,
       n_chars_calc,
       round((n_chars_calc - (len(ws) - 1)) / len(ws), 4) AS avg_token_len,
       round(len(list_distinct(ws)) / len(ws), 4) AS distinct_ratio
FROM t
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load(spark, sf_dir, "documents"))


TEXT_QUALITY_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws, length(text) AS nc
  FROM documents
)
SELECT doc_id,
       round(0.5 * least(len(ws) / 200.0, 1.0)
             + 0.5 * (len(list_distinct(ws)) / len(ws)), 4) AS quality_score
FROM t
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load(spark, sf_dir, "documents"))


def _markers_sql(lang: str) -> str:
    return ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])


LANG_ID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents
),
scored AS (
  SELECT doc_id,
         len(list_filter(ws, t -> t IN ({_markers_sql("de")}))) AS score_de,
         len(list_filter(ws, t -> t IN ({_markers_sql("en")}))) AS score_en,
         len(list_filter(ws, t -> t IN ({_markers_sql("es")}))) AS score_es,
         len(list_filter(ws, t -> t IN ({_markers_sql("fr")}))) AS score_fr
  FROM t
)
SELECT doc_id,
       CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
            WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
            WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
            WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM scored
"""


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count_bpe(load(spark, sf_dir, "documents"))


BPE_COUNT_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{TOKEN_REGEX}')) AS n_bpe_tokens
FROM documents
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load(spark, sf_dir, "documents"))


FINGERPRINT_ORACLE = """
SELECT doc_id,
       substring(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16)
         AS fingerprint
FROM documents
"""


QUERIES = [
    Query("text_stats", text_stats, TEXT_STATS_ORACLE, "ext: quality features"),
    Query("text_quality", text_quality, TEXT_QUALITY_ORACLE, "ext: quality score"),
    Query("lang_id", lang_id, LANG_ID_ORACLE, "ext: language id"),
    Query("bpe_token_count", bpe_token_count, BPE_COUNT_ORACLE, "ext: token budget"),
    Query("doc_fingerprint", doc_fingerprint, FINGERPRINT_ORACLE, "ext: fingerprint"),
]
