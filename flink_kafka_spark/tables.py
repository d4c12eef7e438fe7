"""Testdata / fixture table loading.

The driver provides deterministic parquet tables (TESTDATA.md):
``region nation customer supplier part orders lineitem events
documents embeddings`` under ``/root/testdata/sf{0.001,0.01,0.1}``.
All queries in the registry read from these via :func:`load` /
:func:`register_views`.

The reference's own CSV fixtures (UserBehavior / apache.log / ...,
SURVEY.md §1.2) are covered by :mod:`flink_kafka_spark.schemas`, used
by the reference-parity plans and the streaming tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → columnar, pushdown-capable.

    ``events.ts`` is stored as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long which
    we truncate to microseconds — matching DuckDB's ns→µs truncation —
    and cast to TimestampType.
    """
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS): Spark has no nanos
        # type and a plain session fails with PARQUET_TYPE_ILLEGAL.
        # Set the (runtime-settable) legacy flag defensively so the
        # engine works under ANY caller-provided SparkSession (the
        # driver harness builds its own), not just session.get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # ms-unit parquet timestamps arrive as TIMESTAMP_NTZ; normalize to
    # session-UTC TimestampType so epoch casts/window() behave uniformly
    # (same instant DuckDB sees for its naive timestamps).
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views with the same names DuckDB's oracle uses,
    so a single ANSI-SQL string can run on both engines."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
