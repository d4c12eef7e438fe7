"""Dataset sampling / splitting (engine extension: training-data
pipeline ops; the reference has no sampling surface).

Split assignment must be a pure function of the row id — never `rand()`
— so that re-running the pipeline (or running it on a different
cluster/partitioning) assigns every row to the same split. The mixer
is a Knuth multiplicative hash kept inside 63 bits so the identical
arithmetic runs on any ANSI SQL engine (oracle-checkable, no
engine-specific hash function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761  # 2^32 * golden ratio conjugate


def split_bucket_expr(id_col: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): Knuth multiplicative mix
    of the integer id — identical formula expressible in plain SQL."""
    return F.expr(f"pmod(({id_col} * {_KNUTH}L) % 1000000007, {n_buckets})")


def split_bucket_sql(id_col: str, n_buckets: int = 100) -> str:
    """The DuckDB/ANSI twin of :func:`split_bucket_expr`."""
    return f"(({id_col} * {_KNUTH}) % 1000000007) % {n_buckets}"


def train_val_test_split(
    df: DataFrame, id_col: str, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Assign train/val/test by deterministic bucket — a narrow
    projection (no shuffle, no state), stable across runs and
    partitionings."""
    b = split_bucket_expr(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): keeps ~fraction
    of each stratum. Seeded → deterministic for a fixed partitioning;
    for partitioning-independent sampling use a bucket threshold on
    :func:`split_bucket_expr` instead."""
    return df.sampleBy(stratum_col, fractions, seed)
