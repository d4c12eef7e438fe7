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


def kafka_source_options(
    topic: str, bootstrap: str = "localhost:9092", starting_offsets: str = "latest"
) -> dict[str, str]:
    """The S1 consumer option contract (HotItems.java:50-58:
    ``bootstrap.servers``/group/``auto.offset.reset=latest`` consumer
    props → the Spark kafka source's option names). Factored out as a
    pure function so the option names are pinned by a plan-contract
    test even where the kafka connector jar (and any broker) is absent
    — an option-name typo here would otherwise only surface in
    production. Keys are the documented spark-sql-kafka option names:
    ``subscribe`` (not topic), ``startingOffsets`` (camelCase),
    ``kafka.bootstrap.servers`` (kafka. prefix pass-through)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


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
        .options(**kafka_source_options(topic, bootstrap, starting_offsets))
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


def json_lines_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sec_ts: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """JSON-lines file replay (beyond the reference's CSV-only surface
    — the jq-able format every modern log pipeline emits): one JSON
    object per line → typed columns via ``from_json``. Timestamp
    fields arrive as epoch seconds (``sec_ts=False``: milliseconds)
    and land as TimestampType, matching every other source here, so
    the same windowed jobs run unchanged on either wire format.

    Scale shape: the text scan is splittable per file, ``from_json``
    is a JVM expression inside whole-stage codegen (no Python), and a
    malformed line yields NULL columns rather than failing the batch —
    gate on ``F.col(key).isNotNull()`` downstream for dead-letter
    routing (the K2 side-output pattern).

    FLAT schemas only: the epoch→timestamp shadow conversion rewrites
    top-level fields — a TimestampType nested inside a struct/array
    would silently parse to NULL, so nesting fails loudly here."""
    nested = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
    ]
    if nested:
        raise ValueError(
            "json_lines_source supports FLAT schemas only (the timestamp "
            f"shadow conversion is top-level): nested fields {nested}"
        )
    shadow = T.StructType(
        [
            T.StructField(
                f.name,
                T.LongType() if isinstance(f.dataType, T.TimestampType) else f.dataType,
            )
            for f in schema.fields
        ]
    )
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    rec = reader.text(path).select(F.from_json(F.col("value"), shadow).alias("_r"))
    cols = []
    for f in schema.fields:
        c = F.col(f"_r.{f.name}")
        if isinstance(f.dataType, T.TimestampType):
            c = F.timestamp_seconds(c) if sec_ts else F.timestamp_millis(c)
        cols.append(c.alias(f.name))
    return rec.select(*cols)


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


def kafka_producer_options(topic: str, bootstrap: str = "localhost:9092") -> dict[str, str]:
    """The S5/K-sink producer option contract (KafkaProducerUtil.java:
    27-47: ``bootstrap.servers`` + per-record topic → the Spark kafka
    sink's ``topic`` option). Pure function, shared by the batch feed
    below and :func:`..streaming.sinks.kafka_sink`, pinned by a
    plan-contract test (no broker/jar needed)."""
    return {"kafka.bootstrap.servers": bootstrap, "topic": topic}


def csv_feed_values(df: DataFrame) -> DataFrame:
    """The producer's record payload: every column cast to string and
    comma-joined into one ``value`` column — the same line format the
    reference producer reads back out of UserBehavior.csv
    (KafkaProducerUtil.java:36-44 sends raw CSV lines). Split out so
    the payload shape is testable on a batch frame without a broker."""
    return df.select(
        F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns]).alias("value")
    )


def kafka_feed(df: DataFrame, topic: str, bootstrap: str = "localhost:9092") -> None:
    """S5: KafkaProducerUtil (KafkaProducerUtil.java:27-47) — batch
    write a DataFrame's rows to a topic as CSV lines."""
    (
        csv_feed_values(df)
        .write.format("kafka")
        .options(**kafka_producer_options(topic, bootstrap))
        .save()
    )
