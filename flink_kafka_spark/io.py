"""Batch I/O helpers: partitioned and bucketed parquet, symmetric
read/write.

At 100 TB the dominant costs are scan bytes and shuffle bytes. These
helpers encode the two storage-side levers:

- **partitionBy(date/tenant/...)**: directory-level partition pruning —
  a date-filtered query touches only its partitions' files.
- **bucketBy(key)**: pre-shuffled storage. Two tables bucketed on the
  same key with the same bucket count join with NO exchange on either
  side (and groupBy on the bucket key skips its exchange too) — the
  shuffle is paid once at write time instead of every query. Bucketed
  writes go through ``saveAsTable`` (bucket metadata lives in the
  catalog; plain parquet paths can't carry it).

Bucket-count sizing: aim for ~128-512 MB of post-compression data per
bucket per partition at the target scale; too few buckets caps join
parallelism, too many makes small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet with directory partitioning (pruning lever)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write a bucketed (optionally sort-within-bucket) catalog table.
    Joins/aggregations on ``bucket_cols`` against an equally-bucketed
    table run exchange-free. ``path`` overrides the warehouse location
    (bucket metadata still lives in the catalog — saveAsTable is
    required; plain parquet paths can't carry it)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
