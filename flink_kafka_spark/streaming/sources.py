"""Streaming sources (SURVEY.md §2.1 S1-S5).

Each factory returns a streaming DataFrame with one of the schemas in
:mod:`flink_kafka_spark.schemas`. The Kafka source/sink need the
spark-sql-kafka connector jar on the classpath (standard Spark
distribution artifact); creation is lazy so environments without it
can still import this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import parse_csv_lines


def kafka_source(
    spark: SparkSession,
    topic: str,
    schema: T.StructType,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "latest",
    sec_ts: bool = True,
) -> DataFrame:
    """S1: FlinkKafkaConsumer("hotitems", SimpleStringSchema, props)
    (HotItems.java:50-58) → readStream.format("kafka") + CSV-value
    parse. ``auto.offset.reset=latest`` → startingOffsets."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_csv_lines(raw.select(F.col("value").cast("string")), schema, sec_ts)


def socket_source(
    spark: SparkSession, host: str, port: int, schema: T.StructType, sec_ts: bool = True
) -> DataFrame:
    """S3: env.socketTextStream (HotPages.java:48)."""
    raw = spark.readStream.format("socket").option("host", host).option("port", port).load()
    return parse_csv_lines(raw, schema, sec_ts)


def file_stream_source(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    """Typed file-based streaming read (deterministic micro-batch
    tests use this + availableNow)."""
    reader = spark.readStream.schema(schema)
    return reader.format(fmt).load(path)


def csv_replay_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sec_ts: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S2: env.readTextFile bounded replay (HotItems.java:47-48 et al.)
    — text-file stream + the positional CSV parser P1. One file per
    trigger (``max_files_per_trigger=1``) gives multi-micro-batch
    replays whose watermark advances between batches, which is how
    tests exercise event-time timers deterministically."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_csv_lines(reader.text(path), schema, sec_ts)


# S4: the synthetic marketing generator (AppMarketingByChannel.java:60-90):
# one random MarketingUserBehavior every 100 ms from 4 behaviors × 3
# channels. Rate source + deterministic xxhash64-based pick.
_BEHAVIORS = ("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")
_CHANNELS = ("app store", "wechat", "weibo")


def marketing_rate_source(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    raw = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    behaviors = F.array(*[F.lit(b) for b in _BEHAVIORS])
    channels = F.array(*[F.lit(c) for c in _CHANNELS])
    return raw.select(
        F.pmod(F.xxhash64("value"), F.lit(1000)).alias("user_id"),
        behaviors[F.pmod(F.xxhash64("value", F.lit(1)), F.lit(len(_BEHAVIORS)))].alias(
            "behavior"
        ),
        channels[F.pmod(F.xxhash64("value", F.lit(2)), F.lit(len(_CHANNELS)))].alias("channel"),
        F.col("timestamp").alias("ts"),
    )


def kafka_feed(df: DataFrame, topic: str, bootstrap: str = "localhost:9092") -> None:
    """S5: KafkaProducerUtil (KafkaProducerUtil.java:27-47) — batch
    write a DataFrame's rows to a topic as CSV lines."""
    csv_value = F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns])
    (
        df.select(csv_value.alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
