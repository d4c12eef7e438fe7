"""Multimodal query family: binary-payload media pipelines.

Extension scope (no reference analog — SURVEY.md §1.1 has no binary
data). Media rows are synthesized deterministically from ``documents``
(payload = UTF-8 bytes of ``text``, ASCII-only in the testdata, so the
DuckDB oracle can reproduce every byte-level result with varchar
functions: ``md5``/``substring``/``ascii`` operate on the same bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    decode_media_meta,
    extract_features,
    frame_sample,
    synthesize_media,
)
from ..tables import load
from . import Query

_KIND_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


def media_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load(spark, sf_dir, "documents"))
    return decode_media_meta(media)


MEDIA_DECODE_META_ORACLE = f"""
SELECT doc_id,
       {_KIND_SQL} AS kind,
       CAST(length(text) AS BIGINT) AS byte_len,
       md5(text) AS checksum,
       CASE WHEN doc_id % 3 IN (0, 2)
            THEN CAST(64 + ascii(substring(text, 1, 1)) AS BIGINT) END AS width,
       CASE WHEN doc_id % 3 IN (0, 2)
            THEN CAST(64 + ascii(substring(text, 2, 1)) AS BIGINT) END AS height,
       CASE WHEN doc_id % 3 IN (1, 2)
            THEN CAST(length(text) * 40 AS BIGINT) END AS duration_ms
FROM documents
"""


FRAME_BYTES = 64


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load(spark, sf_dir, "documents"))
    return frame_sample(media, FRAME_BYTES)


MEDIA_FRAME_SAMPLE_ORACLE = f"""
WITH framed AS (
  SELECT doc_id, text,
         unnest(range(CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT))) AS frame_idx
  FROM documents
)
SELECT doc_id,
       frame_idx,
       CAST(least({FRAME_BYTES}, length(text) - frame_idx * {FRAME_BYTES}) AS BIGINT)
         AS frame_len,
       md5(substring(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}))
         AS frame_md5
FROM framed
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided byte-mean feature vectors — rows-only driver check (the
    vector math is unit-tested against a pure-Python reference in
    tests/test_multimodal.py instead of SQL)."""
    media = synthesize_media(load(spark, sf_dir, "documents"))
    return extract_features(media, dim=8)


QUERIES = [
    Query("media_decode_meta", media_decode_meta, MEDIA_DECODE_META_ORACLE,
          "extension: multimodal decode (mapInPandas)", ("multimodal",)),
    Query("media_frame_sample", media_frame_sample, MEDIA_FRAME_SAMPLE_ORACLE,
          "extension: multimodal frame sampling", ("multimodal",)),
    Query("media_features", media_features, None,
          "extension: multimodal feature extraction", ("multimodal",)),
]


def media_features_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property oracle for `media_features`: recompute the strided
    byte means with pure JVM expressions (ascii/substring/aggregate —
    an implementation with nothing in common with the numpy path) and
    count components differing by more than 1e-4 (the 4-dp rounding
    slack; numpy rounds half-even, JVM half-up). A broken Arrow batch
    shape, stride, or payload encoding shows up as a nonzero count and
    fails the driver hash."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    feats = media_features(spark, sf_dir)
    jvm = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, 7), j -> "
            " aggregate(transform(sequence(j + 1, length(text), 8),"
            "                     i -> ascii(substring(text, i, 1))),"
            "           0L, (a, x) -> a + x)"
            " / CAST(size(sequence(j + 1, length(text), 8)) AS DOUBLE))"
        ).alias("jf"),
    )
    joined = feats.join(jvm, "doc_id")
    bad_row = (
        (F.col("dim") != 8)
        | (F.size("features") != 8)
        | F.expr("exists(zip_with(jf, features, (a, b) -> abs(a - b) > 0.0001), x -> x)")
    ).cast("bigint")
    return joined.agg(F.coalesce(F.sum(bad_row), F.lit(0)).cast("bigint").alias("violations"))


MEDIA_FEATURES_CHECK_ORACLE = "SELECT CAST(0 AS BIGINT) AS violations"

QUERIES.append(
    Query(
        "media_features_check",
        media_features_check,
        MEDIA_FEATURES_CHECK_ORACLE,
        "extension: multimodal feature property oracle",
        ("multimodal",),
    )
)
