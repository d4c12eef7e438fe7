"""Snapshot diffing (engine extension: dataset versioning).

A training-data pipeline republishes its corpus repeatedly; the diff
between two snapshots — what was added, removed, or edited — is both
the audit artifact and the input to incremental downstream refresh
(the batch analog of the reference's retract/changelog stream,
SURVEY.md §2 K4: a changelog says how a LIVE result changed, a
snapshot diff says how a PUBLISHED dataset changed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``id_col``: one row per
    id present in either side with status ``added`` / ``removed`` /
    ``changed`` / ``unchanged``, comparing an md5 over the content
    columns instead of the payloads themselves. The digest input is the
    JSON of a struct of the columns: JSON quoting/field-dropping makes
    NULL, empty string, and the literal string 'null' three distinct
    digests (a coalesce-to-sentinel concat would collide them), so the
    comparison has IS DISTINCT FROM semantics — NULL is a value,
    matching the oracle's formulation.

    Scale: both sides shed everything but (id, 16-byte digest) BEFORE
    the full-outer join — the one shuffle moves fingerprints, never
    content. Joining on the id (not the digest) keeps the plan
    skew-free for the common republish case where most rows are
    unchanged."""
    fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in content_cols])))
    o = old.select(F.col(id_col).alias("_oid"), fp.alias("_ofp"))
    n = new.select(F.col(id_col).alias("_nid"), fp.alias("_nfp"))
    return (
        o.join(n, F.col("_oid") == F.col("_nid"), "full_outer")
        .select(
            F.coalesce(F.col("_nid"), F.col("_oid")).alias(id_col),
            F.when(F.col("_oid").isNull(), "added")
            .when(F.col("_nid").isNull(), "removed")
            .when(F.col("_ofp") != F.col("_nfp"), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
    )
