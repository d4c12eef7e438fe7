"""Schemas + parsers for the reference's seven input streams
(SURVEY.md §1.2) and loaders for its checked-in CSV fixtures.

Every reference stream is a flat POJO parsed positionally from CSV
(``HotItems.java:62-66`` pattern: split(',') + constructors). Here each
gets an explicit StructType and a line-parser expression usable on both
batch (``spark.read``) and streaming (``spark.readStream``) text
sources — schema-on-read, no inference, mirroring the reference's
fixed implicit schemas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- StructTypes (reference beans → Spark schemas) ---

# HotItemsAnalysis/.../beans/UserBehavior.java:15-19 (ts: epoch seconds)
USER_BEHAVIOR = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("item_id", T.LongType()),
        T.StructField("category_id", T.IntegerType()),
        T.StructField("behavior", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# NetworkFlowAnalysis/.../beans/ApacheLogEvent.java:13-17 (ts parsed from
# dd/MM/yyyy:HH:mm:ss, HotPages.java:52-54)
APACHE_LOG = T.StructType(
    [
        T.StructField("ip", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("method", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

# MarketAnalysis/.../beans/MarketingUserBehavior.java:13-16 (ts: epoch ms)
MARKETING_USER_BEHAVIOR = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("behavior", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# MarketAnalysis/.../beans/AdClickEvent.java:13-17
AD_CLICK = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ad_id", T.LongType()),
        T.StructField("province", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# LoginFailDetect/.../beans/LoginEvent.java:13-16
LOGIN_EVENT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ip", T.StringType()),
        T.StructField("login_state", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# OrderPayDetect/.../beans/OrderEvent.java:13-16 (tx_id empty for create)
ORDER_EVENT = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("tx_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# OrderPayDetect/.../beans/ReceiptEvent.java:13-15
RECEIPT_EVENT = T.StructType(
    [
        T.StructField("tx_id", T.StringType()),
        T.StructField("pay_channel", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _csv_fields(schema: T.StructType, parts: Column, sec_ts: bool) -> list[Column]:
    cols = []
    for i, field in enumerate(schema.fields):
        c = parts.getItem(i)
        if isinstance(field.dataType, T.TimestampType):
            c = (
                F.timestamp_seconds(c.cast("long"))
                if sec_ts
                else F.timestamp_millis(c.cast("long"))
            )
        else:
            c = c.cast(field.dataType)
        cols.append(c.alias(field.name))
    return cols


def parse_csv_lines(
    lines: DataFrame, schema: T.StructType, sec_ts: bool = True, value_col: str = "value"
) -> DataFrame:
    """P1: positional comma-split parser (works on batch text reads,
    socket streams, and Kafka value columns alike). ``sec_ts`` selects
    epoch-seconds (reference ×1000 at watermark assignment) vs ms."""
    parts = F.split(F.col(value_col), ",")
    return lines.select(*_csv_fields(schema, parts, sec_ts))


def parse_apache_log_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """P2: space-split + dd/MM/yyyy:HH:mm:ss parse (HotPages.java:51-56;
    the +0000 zone token at position 4 is ignored, like the reference)."""
    p = F.split(F.col(value_col), r"\s+")
    return lines.select(
        p.getItem(0).alias("ip"),
        p.getItem(1).alias("user_id"),
        F.to_timestamp(p.getItem(3), "dd/MM/yyyy:HH:mm:ss").alias("ts"),
        p.getItem(5).alias("method"),
        p.getItem(6).alias("url"),
    )
