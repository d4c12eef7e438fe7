"""Z-order (Morton-curve) layout clustering — the data-layout
primitive behind multi-dimensional data skipping (public art:
Delta Lake OPTIMIZE ZORDER, Databricks' and Iceberg's sort-order
docs; Morton 1966): interleaving the bits of several rank-scaled
columns produces a single sort key under which every contiguous file
of rows covers a TIGHT hyper-rectangle in all the interleaved
dimensions at once, so min/max file statistics prune range predicates
on ANY of them — where a 1-D sort gives perfect pruning on one column
and none on the others.

The reference has no layout surface (Flink jobs stream; they never
choose file order); this is the 100 TB ingest-side complement to the
query operators: a corpus laid out this way turns the engine's
ordinary parquet min/max pruning into multi-column skipping for free.

Determinism contract: every step is exact BIGINT arithmetic —
equal-width scaling by integer division against broadcast global
bounds, bit extraction/interleave via shifts and masks — so Spark and
DuckDB agree bit-for-bit with no rounding convention at all.

Scale design (100 TB):

- the bounds frame is ONE row (a global min/max aggregate) broadcast
  onto the scan; zkey computation is a pure JVM expression inside
  whole-stage codegen — zero shuffle added to the scan;
- the actual layout write is ``repartitionByRange(zkey)`` (one range
  shuffle — the inherent cost of ANY clustering rewrite, identical to
  what a 1-D sort-write pays) feeding ``io.write_partitioned``;
- the locality audit aggregates per-bucket bounds: output is
  |buckets| rows, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: str, vmin: str, vmax: str, bits: int) -> str:
    """Equal-width rank of ``col`` into [0, 2^bits) as exact BIGINT
    integer division against global bounds (degenerate all-equal
    domain -> 0 via the greatest() guard)."""
    top = (1 << bits) - 1
    return (
        f"CAST((CAST({col} AS BIGINT) - {vmin}) * {top}"
        f" div greatest({vmax} - {vmin}, CAST(1 AS BIGINT)) AS BIGINT)"
    )


def _interleave_expr(scaled: list[str], bits: int) -> str:
    """Morton interleave of pre-scaled [0, 2^bits) BIGINTs: bit b of
    column c lands at position b*n_cols + c. Unrolled shift/mask terms
    — exact, engine-agnostic, codegen-friendly."""
    n = len(scaled)
    terms = [
        f"(shiftleft(shiftright({s}, {b}) & 1, {b * n + c}))"
        for b in range(bits)
        for c, s in enumerate(scaled)
    ]
    return " + ".join(terms)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_name: str = "zkey",
) -> DataFrame:
    """Append a Morton z-key over ``cols`` (each cast to BIGINT —
    callers pre-bucket continuous/temporal values, e.g. epoch-day).
    Bounds come from one 1-row aggregate broadcast onto the scan; the
    key itself is a pure expression. ``bits`` per column; the key
    needs bits*len(cols) <= 63 total. Operating ceiling: the scaling
    multiply is exact only while (max - min) · (2^bits − 1) stays
    under 2^63 — i.e. domain width below ~2^(63 − bits); pre-bucket
    wider domains (epoch-days not epoch-micros)."""
    if len(cols) < 2:
        raise ValueError("zorder_key needs >= 2 columns to interleave")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows BIGINT")
    bounds = df.agg(
        *[
            e
            for c in cols
            for e in (
                F.min(F.col(c).cast("bigint")).alias(f"_min_{c}"),
                F.max(F.col(c).cast("bigint")).alias(f"_max_{c}"),
            )
        ]
    )
    scaled = [_scale_expr(c, f"_min_{c}", f"_max_{c}", bits) for c in cols]
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(key_name, F.expr(_interleave_expr(scaled, bits)))
        .drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])
    )


def zorder_locality(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_buckets: int = 64,
) -> DataFrame:
    """The layout AUDIT: bucket rows by z-key range (the file boundary
    a ``repartitionByRange(zkey)`` write would draw) and report each
    bucket's row count and per-dimension min/max — the exact min/max
    statistics parquet footers would carry, i.e. what a range
    predicate on any single dimension could skip. Output one row per
    non-empty bucket: (bucket, n_rows, min_/max_ per col).

    The pytest contract quantifies the win: summed per-bucket extents
    under z-order are a small fraction of what the SAME bucketing over
    a 1-D sort yields on the non-sorted dimension."""
    zbits = bits * len(cols)
    width = max((1 << zbits) // n_buckets, 1)
    keyed = zorder_key(df, cols, bits)
    return (
        keyed.groupBy(
            F.expr(f"CAST(zkey div {width} AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                e
                for c in cols
                for e in (
                    F.min(F.col(c).cast("bigint")).alias(f"min_{c}"),
                    F.max(F.col(c).cast("bigint")).alias(f"max_{c}"),
                )
            ],
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 64,
) -> None:
    """Materialize the layout: z-key the frame, range-partition on the
    key (one shuffle — the inherent clustering-write cost), drop the
    key and write parquet; each output file then covers a tight
    hyper-rectangle in every interleaved dimension, which the engine's
    ordinary footer min/max pruning exploits on read."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
