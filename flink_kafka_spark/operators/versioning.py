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


def changes_from_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """The changelog a republish SHIPS: :func:`snapshot_diff` verdicts
    joined with payloads — ``(id, op, *content_cols)`` where op is
    ``upsert`` (added/changed rows carry the NEW payload) or
    ``delete`` (payload columns null). Unchanged rows don't appear:
    the changelog's size is the edit volume, not the corpus.

    Scale: the diff shuffles fingerprints only; the payload join
    touches just the added/changed ids (broadcast-friendly for the
    common small-edit republish)."""
    diff = snapshot_diff(old, new, id_col, content_cols)
    upserts = (
        diff.filter(F.col("status").isin("added", "changed"))
        .select(id_col)
        .join(new, id_col)
        .select(id_col, F.lit("upsert").alias("op"), *content_cols)
    )
    deletes = diff.filter(F.col("status") == "removed").select(
        id_col,
        F.lit("delete").alias("op"),
        *[F.lit(None).cast(dict(new.dtypes)[c]).alias(c) for c in content_cols],
    )
    return upserts.unionByName(deletes)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """MERGE INTO without a table format: apply a
    :func:`changes_from_diff`-shaped changelog to a base snapshot —
    upserts replace-or-insert by id, deletes drop the id — yielding
    the next snapshot. ``apply_changes(old, changes_from_diff(old,
    new)) == new`` exactly (the roundtrip the registered
    ``changelog_roundtrip`` query pins against an oracle that computes
    ``new`` directly).

    Scale: one id-keyed anti-join (base rows whose id appears in the
    changelog at all — superseded or deleted) + a union with the
    upsert payloads. The changelog side is edit-volume-sized, so AQE
    broadcasts it for the common small-edit republish; the base is
    never shuffled."""
    keyed = changes.select(F.col(id_col), "op", *content_cols)
    survivors = base.select(id_col, *content_cols).join(
        keyed.select(id_col), id_col, "left_anti"
    )
    upserts = keyed.filter(F.col("op") == "upsert").select(id_col, *content_cols)
    return survivors.unionByName(upserts)
