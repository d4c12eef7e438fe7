"""Streaming sinks (SURVEY.md §2.2 K1-K4).

- console / memory sinks for the reference's ``.print()`` surface;
- tagged side outputs (Flink OutputTag) → ``result_type`` filter on
  one output stream;
- Kafka sink for pipeline feeds;
- `foreachBatch` for per-micro-batch ranking (R2's late-update-safe
  Top-N) and for arbitrary external stores (replacing the Redis sink
  K3 — the Bloom-filter/bitmap state it held lives in Spark streaming
  state instead, SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery


def console_sink(df: DataFrame, mode: str = "update", truncate: bool = False) -> DataStreamWriter:
    """K1: .print() → console sink (mode 'complete'/'update' stands in
    for the retract stream K4 — Spark re-emits corrected rows instead
    of explicit (false,-U)/(true,+U) pairs)."""
    return df.writeStream.outputMode(mode).format("console").option("truncate", truncate)


def memory_sink(df: DataFrame, name: str, mode: str = "append") -> StreamingQuery:
    """Test sink: materialize into an in-memory table."""
    return df.writeStream.outputMode(mode).format("memory").queryName(name).start()


def side_output(df: DataFrame, tag: str, tag_col: str = "result_type") -> DataFrame:
    """K2: getSideOutput(tag) → filter on the tagged-union column."""
    return df.filter(df[tag_col] == tag)


def kafka_sink(
    df: DataFrame, topic: str, bootstrap: str = "localhost:9092", checkpoint: str | None = None
) -> DataStreamWriter:
    w = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
    return w.option("checkpointLocation", checkpoint) if checkpoint else w


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str] | None = None,
) -> DataStreamWriter:
    """Production file sink: append-mode parquet with a checkpoint for
    end-to-end exactly-once (file-sink manifest + WAL offsets mean a
    restarted query neither loses nor duplicates batches). Partition
    columns give downstream readers pruning for free."""
    w = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    return w.partitionBy(*partition_cols) if partition_cols else w


def foreach_batch_sink(
    df: DataFrame, fn: Callable[[DataFrame, int], None], mode: str = "update"
) -> DataStreamWriter:
    """Escape hatch for per-batch logic (ranking, external stores,
    multi-sink fan-out) with exactly-once-per-batch semantics."""
    return df.writeStream.outputMode(mode).foreachBatch(fn)
