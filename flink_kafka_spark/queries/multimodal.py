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
    """Strided byte-mean feature vectors in LONG form
    ``(doc_id, dim_idx, val)`` — one row per vector component, so the
    driver's pandas canonicalizer can sort/hash every cell (array
    columns are not hashable there; round-7 verdict item 1). The numpy
    mapInPandas path stays the thing under test; only the registered
    projection flattens."""
    from pyspark.sql import functions as F

    media = synthesize_media(load(spark, sf_dir, "documents"))
    feats = extract_features(media, dim=8)
    return feats.select(
        "doc_id", F.posexplode("features").alias("dim_idx", "val")
    ).select("doc_id", F.col("dim_idx").cast("int").alias("dim_idx"), "val")


# The strided byte mean is exact on both engines: integer byte sum in
# float64, one IEEE division, floor-based half-up round (see
# extract_features). DuckDB's scalar generate_series yields a LIST, so
# the per-dim positions stay a plain expression — empty stride (doc
# shorter than dim_idx+1 bytes, incl. empty docs) -> NULL avg -> 0.0,
# matching the numpy path's explicit zero fill.
MEDIA_FEATURES_ORACLE = """
SELECT d.doc_id,
       CAST(dims.dim_idx AS INT) AS dim_idx,
       COALESCE(
         floor(list_aggregate(
                 list_transform(generate_series(CAST(dims.dim_idx + 1 AS BIGINT),
                                                CAST(length(d.text) AS BIGINT), 8),
                                i -> ascii(substring(d.text, CAST(i AS INT), 1))),
                 'avg') * 10000 + 0.5) / 10000,
         0.0) AS val
FROM documents d, (SELECT unnest(range(8)) AS dim_idx) dims
"""


QUERIES = [
    Query("media_decode_meta", media_decode_meta, MEDIA_DECODE_META_ORACLE,
          "extension: multimodal decode (mapInPandas)", ("multimodal",)),
    Query("media_frame_sample", media_frame_sample, MEDIA_FRAME_SAMPLE_ORACLE,
          "extension: multimodal frame sampling", ("multimodal",)),
    Query("media_features", media_features, MEDIA_FEATURES_ORACLE,
          "extension: multimodal feature extraction", ("multimodal",)),
]


def media_features_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property oracle for `media_features`: recompute the strided
    byte means with pure JVM expressions (ascii/substring/aggregate —
    an implementation with nothing in common with the numpy path) and
    count long-form rows differing by more than 1e-4 (the 4-dp
    rounding slack) plus docs that don't emit exactly 8 components. A
    broken Arrow batch shape, stride, payload encoding or posexplode
    projection shows up as a nonzero count and fails the driver hash."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    feats = media_features(spark, sf_dir)
    jvm = docs.select(
        "doc_id",
        # the CASE guards the empty stride: sequence(lo, hi, step)
        # THROWS under ANSI when lo > hi, so a doc shorter than j+1
        # bytes must short-circuit to NULL (-> the coalesced 0.0 below,
        # matching the numpy path's fill) before sequence evaluates
        F.expr(
            "transform(sequence(0, 7), j -> "
            " CASE WHEN length(text) >= j + 1 THEN"
            "  aggregate(transform(sequence(j + 1, length(text), 8),"
            "                      i -> ascii(substring(text, i, 1))),"
            "            0L, (a, x) -> a + x)"
            "  / CAST(size(sequence(j + 1, length(text), 8)) AS DOUBLE)"
            " END)"
        ).alias("jf"),
    ).select(
        "doc_id",
        F.posexplode("jf").alias("dim_idx", "jval"),
        F.lit(True).alias("jvm_present"),
    )
    joined = feats.join(jvm, ["doc_id", "dim_idx"], "full_outer")
    # jval is legitimately NULL for an empty stride (doc shorter than
    # dim_idx+1 bytes) — the numpy path fills 0.0 there, so compare
    # against the coalesced zero; only a truly absent row is a miss.
    bad_row = (
        F.col("jvm_present").isNull()
        | F.col("val").isNull()
        | (F.abs(F.col("val") - F.coalesce(F.col("jval"), F.lit(0.0))) > 0.0001)
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
