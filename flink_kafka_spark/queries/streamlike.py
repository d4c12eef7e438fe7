"""Windowed-aggregation + Top-N query family (SURVEY.md §2.6-2.8).

These re-express the reference's five windowed-count pipelines on the
driver's ``events`` table (event_id, ts, user_id, event_type, value,
props-json):

- hot-items Top-N per sliding window   (reference ``HotItems.java``,
  ``HotItemsWithSql.java``: W1+A1+G1/G2+R1/R3)
- total PV per tumbling window          (``PageView.java``: W5+A8+P3)
- distinct UV per tumbling window       (``UniqueVisitor.java``: W6+A6;
  Bloom-filter variant ``UvWithBloomFilter.java``: A7 → HLL++)
- per-channel×behavior sliding counts   (``AppMarketingByChannel.java``:
  W3+A3+G5) and the global variant      (``AppMarketingStatistics.java``:
  A4+G8)
- per-province sliding counts           (``AdStatisticsByProvince.java``:
  W4+A5) — expressed on ``orders`` per day×priority.

The DuckDB oracle emulates Spark's ``window()`` sliding semantics
(epoch-aligned, left-closed-right-open) by cross-joining each row with
``range(size/slide)`` slide offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topn import topn_counts_per_window
from ..operators.windows import windowed_count, windowed_distinct
from ..tables import load
from . import Query


def _hop_cte(table: str, ts: str, size_s: int, slide_s: int, cols: str) -> str:
    """DuckDB CTE assigning each row its size/slide sliding windows,
    epoch-aligned like Spark's window()/Flink's TimeWindow."""
    n = size_s // slide_s
    return f"""
      SELECT {cols},
             CAST(floor(epoch({ts})/{slide_s}) AS BIGINT)*{slide_s} - g.i*{slide_s}
               AS window_start_s,
             CAST(floor(epoch({ts})/{slide_s}) AS BIGINT)*{slide_s} - g.i*{slide_s} + {size_s}
               AS window_end_s
      FROM {table} CROSS JOIN range({n}) g(i)
    """


# --- hot items: top-5 users by event count per sliding 1h/15min window ---

HOT_ITEMS_SIZE_S, HOT_ITEMS_SLIDE_S, HOT_ITEMS_N = 3600, 900, 5


def hot_items_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    counts = windowed_count(events, "ts", "1 hour", "15 minutes", keys=["user_id"])
    return topn_counts_per_window(counts, "user_id", HOT_ITEMS_N).select(
        "window_start_s", "window_end_s", "user_id", "cnt", "rank"
    )


HOT_ITEMS_ORACLE = f"""
WITH hopped AS ({_hop_cte("events", "ts", HOT_ITEMS_SIZE_S, HOT_ITEMS_SLIDE_S, "user_id")}),
counts AS (
  SELECT window_start_s, window_end_s, user_id, count(*) AS cnt
  FROM hopped GROUP BY 1, 2, 3
)
SELECT window_start_s, window_end_s, user_id, cnt, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY window_start_s, window_end_s
    ORDER BY cnt DESC, user_id ASC) AS rank
  FROM counts
) WHERE rank <= {HOT_ITEMS_N}
"""


# --- formatted Top-N report strings (P6, HotItems.java:177-195) ---

def hot_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: the reference's console report block per window, built
    aggregation-side (see operators.topn.format_topn_report). The
    structured hot_items_topn stays the primary surface; this is the
    sink-formatting twin."""
    from ..operators.topn import format_topn_report

    return format_topn_report(hot_items_topn(spark, sf_dir), "user_id")


HOT_ITEMS_REPORT_ORACLE = f"""
WITH hopped AS ({_hop_cte("events", "ts", HOT_ITEMS_SIZE_S, HOT_ITEMS_SLIDE_S, "user_id")}),
counts AS (
  SELECT window_start_s, window_end_s, user_id, count(*) AS cnt
  FROM hopped GROUP BY 1, 2, 3
),
ranked AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY window_start_s, window_end_s
      ORDER BY cnt DESC, user_id ASC) AS rank
    FROM counts
  ) WHERE rank <= {HOT_ITEMS_N}
),
lines AS (
  SELECT window_start_s, window_end_s, rank,
         'No' || CAST(rank AS VARCHAR) || ': user_id=' ||
         CAST(user_id AS VARCHAR) || ' cnt=' || CAST(cnt AS VARCHAR) AS l
  FROM ranked
)
SELECT window_start_s, window_end_s,
       '==== window ' || CAST(window_start_s AS VARCHAR) || '-' ||
       CAST(window_end_s AS VARCHAR) || ' ====' || chr(10) ||
       array_to_string(list(l ORDER BY rank), chr(10)) AS report
FROM lines GROUP BY 1, 2
"""


# --- hot items, pure-SQL surface (A10/R3): HOP → window() TVF ---

def hot_items_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one declarative query (HotItemsWithSql.java:80-89)
    — ROW_NUMBER over a HOP-window count — as a single spark.sql()."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
      SELECT window_start_s, window_end_s, event_type, cnt, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY window_start_s, window_end_s
          ORDER BY cnt DESC, event_type ASC) AS rank
        FROM (
          SELECT CAST(window.start AS LONG) AS window_start_s,
                 CAST(window.end AS LONG) AS window_end_s,
                 event_type, count(*) AS cnt
          FROM events
          GROUP BY window(ts, '2 hours', '30 minutes'), event_type
        )
      ) WHERE rank <= 3
    """)


HOT_ITEMS_SQL_ORACLE = f"""
WITH hopped AS ({_hop_cte("events", "ts", 7200, 1800, "event_type")}),
counts AS (
  SELECT window_start_s, window_end_s, event_type, count(*) AS cnt
  FROM hopped GROUP BY 1, 2, 3
)
SELECT window_start_s, window_end_s, event_type, cnt, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY window_start_s, window_end_s
    ORDER BY cnt DESC, event_type ASC) AS rank
  FROM counts
) WHERE rank <= 3
"""


# --- page views: global count per tumbling hour ---

def page_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        windowed_count(events.filter(F.col("event_type") == "view"), "ts", "1 hour")
        .withColumnRenamed("cnt", "pv_cnt")
        .select("window_start_s", "window_end_s", "pv_cnt")
    )


PAGE_VIEWS_ORACLE = """
SELECT CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS window_start_s,
       CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 + 3600 AS window_end_s,
       count(*) AS pv_cnt
FROM events WHERE event_type = 'view'
GROUP BY 1, 2
"""


# --- unique visitors: exact distinct users per tumbling day ---

def unique_visitors(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return windowed_distinct(events, "ts", "1 day", "user_id").select(
        "window_start_s", "window_end_s", "uv"
    )


UNIQUE_VISITORS_ORACLE = """
SELECT CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 AS window_start_s,
       CAST(floor(epoch(ts)/86400) AS BIGINT)*86400 + 86400 AS window_end_s,
       count(DISTINCT user_id) AS uv
FROM events GROUP BY 1, 2
"""


# --- approximate UV (HLL++ replaces the reference's Redis Bloom filter) ---

def uv_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return windowed_distinct(events, "ts", "1 day", "user_id", approximate=True).select(
        "window_start_s", "window_end_s", "uv"
    )


def uv_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property oracle for the HLL++ path (same pattern as the dedup/
    ANN check queries): per window, the estimate must sit within
    5×rsd of the exact COUNT(DISTINCT) — windows outside the bound
    are counted, expected constant 0. Turns the A7 sketch from a
    runs-only row into a driver-hashable error bound."""
    rsd = 0.02
    approx = uv_approx(spark, sf_dir).withColumnRenamed("uv", "uv_est")
    exact = unique_visitors(spark, sf_dir)
    joined = approx.join(exact, ["window_start_s", "window_end_s"], "full_outer")
    bad = (
        F.col("uv").isNull()
        | F.col("uv_est").isNull()
        | (F.abs(F.col("uv_est") - F.col("uv")) > 5 * rsd * F.col("uv"))
    )
    return joined.agg(
        F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("windows_out_of_bound")
    )


UV_APPROX_CHECK_ORACLE = "SELECT CAST(0 AS BIGINT) AS windows_out_of_bound"


# --- Bloom-membership UV: the reference's actual A7 semantics ---

def uv_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership-dedup unique visitors (UvWithBloomFilter.java:95-155
    fidelity variant): Bloom bit-test + count++, not a cardinality
    sketch. False positives undercount only; at this corpus scale
    (≤ ~10⁵ users/window vs 2^22 bits) fpp < 1e-9, so the exact
    COUNT(DISTINCT) oracle holds."""
    from ..operators.windows import windowed_uv_bloom

    events = load(spark, sf_dir, "events")
    return windowed_uv_bloom(events, "ts", "1 day", "user_id")


# --- channel stats: sliding 6h/1h counts per event_type ---

def channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return windowed_count(
        events.filter(F.col("event_type") != "error"), "ts", "6 hours", "1 hour",
        keys=["event_type"],
    ).select("window_start_s", "window_end_s", "event_type", "cnt")


CHANNEL_STATS_ORACLE = f"""
WITH hopped AS (
  {_hop_cte("(SELECT * FROM events WHERE event_type <> 'error')", "ts", 21600, 3600, "event_type")}
)
SELECT window_start_s, window_end_s, event_type, count(*) AS cnt
FROM hopped GROUP BY 1, 2, 3
"""


# --- global marketing stats: sliding 6h/1h count, no key ---

def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return windowed_count(events, "ts", "6 hours", "1 hour").select(
        "window_start_s", "window_end_s", "cnt"
    )


GLOBAL_STATS_ORACLE = f"""
WITH hopped AS ({_hop_cte("events", "ts", 21600, 3600, "event_id")})
SELECT window_start_s, window_end_s, count(*) AS cnt
FROM hopped GROUP BY 1, 2
"""


# --- "ad clicks per province" analog: orders per day × priority ---

def orders_daily_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return windowed_count(orders, "o_orderdate", "1 day", keys=["o_orderpriority"]).select(
        "window_start_s", "window_end_s", "o_orderpriority", "cnt"
    )


ORDERS_DAILY_ORACLE = """
SELECT CAST(floor(epoch(o_orderdate)/86400) AS BIGINT)*86400 AS window_start_s,
       CAST(floor(epoch(o_orderdate)/86400) AS BIGINT)*86400 + 86400 AS window_end_s,
       o_orderpriority, count(*) AS cnt
FROM orders GROUP BY 1, 2, 3
"""


# --- scale-path sliding windows: tumbling partials rolled up ---

def global_stats_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as a window('6 hours','30 minutes') count, computed
    the scale way (operators.windows.sliding_from_tumbling): aggregate
    at slide granularity first, then roll 12 partials per window —
    shuffles #distinct slide buckets instead of replicating every
    input row 12x (the right trade for the reference's 1h/5s windows
    W3 at 100 TB)."""
    from ..operators.windows import sliding_from_tumbling

    events = load(spark, sf_dir, "events")
    return sliding_from_tumbling(events, "ts", 21600, 1800).select(
        "window_start_s", "window_end_s", "cnt"
    )


GLOBAL_STATS_FINE_ORACLE = f"""
WITH hopped AS ({_hop_cte("events", "ts", 21600, 1800, "event_id")})
SELECT window_start_s, window_end_s, count(*) AS cnt
FROM hopped GROUP BY 1, 2
"""


# --- hot pages analog (F2/F3 + R2): regex-excluded per-group Top-N ---

def hot_sources_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's HotPages shape (HotPages.java:71-77,128-198) on
    the documents table: drop "static-asset" sources via a negative
    regex (F3's css/js/png/ico exclusion), count per lang×source, rank
    top-3 sources per lang (R2's MapState+timer ranking, declaratively).
    """
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.filter(~F.col("source").rlike("1[0-9]$"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from ..operators.topn import topn_per_partition

    return topn_per_partition(
        counts, ["lang"], [F.col("cnt").desc(), F.col("source").asc()], 3
    ).select("lang", "source", "cnt", "rank")


HOT_SOURCES_ORACLE = """
SELECT lang, source, cnt, rank FROM (
  SELECT lang, source, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, source ASC) AS rank
  FROM (
    SELECT lang, source, count(*) AS cnt
    FROM documents
    WHERE NOT regexp_matches(source, '1[0-9]$')
    GROUP BY lang, source
  )
) WHERE rank <= 3
"""


# --- scalar-function / filter surface (P1-P6, F1-F5): project + json ---

def high_value_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + projection + JSON extraction + date bucketing — the
    reference's parse/filter surface (P1/P2, F1-F5) in one query."""
    events = load(spark, sf_dir, "events")
    return (
        events.filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0))
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.col("ts").cast("date").alias("day"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
    )


HIGH_VALUE_ORACLE = """
SELECT event_id, user_id, round(value, 2) AS value,
       CAST(ts AS DATE) AS day,
       CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events WHERE event_type = 'purchase' AND value > 100.0
"""


# --- first-arrival dedup within a watermark horizon ---
#
# The batch twin of Structured Streaming's
# ``dropDuplicatesWithinWatermark`` (the streaming execution is
# exercised in tests/test_streaming.py against this exact frame): an
# at-least-once feed re-delivers events, and the consumer keeps the
# FIRST arrival per logical key, counting how many deliveries it
# absorbed. One groupBy shuffle with map-side partial aggregation —
# deliberately NOT a row_number window, which would sort whole
# partitions at 100 TB; the (first_ts, first_id) pair travels as one
# packed BIGINT min (ts_s*1e9 + event_id ≈ 1.7e18 < 2^63, exact),
# so the combiner stays a plain min and the decode is two integer ops
# in the terminal projection. The packing is valid while
# event_id < 1e9 and ts_s < ~9.2e9 (year 2261);
# tests/test_timeseries.py::test_dedup_late_packing_bound_holds
# guards the id bound against the fixtures so a generator change
# fails loudly instead of silently mis-ordering (ids at or past the
# bound would let a later small-id row win the min).

EVENTS_DEDUP_LATE_SQL = """
WITH arrivals AS (
  SELECT user_id, event_type,
         CAST(floor(unix_seconds(ts)) AS BIGINT) AS ts_s,
         event_id
  FROM events
)
SELECT user_id, event_type,
       min(ts_s * 1000000000 + event_id) div 1000000000 AS first_ts_s,
       min(ts_s * 1000000000 + event_id) % 1000000000 AS first_event_id,
       CAST(count(*) AS BIGINT) AS arrivals,
       max(ts_s) - min(ts_s) AS span_s
FROM arrivals
GROUP BY user_id, event_type
"""


def events_dedup_late(spark, sf_dir):
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(EVENTS_DEDUP_LATE_SQL)


EVENTS_DEDUP_LATE_ORACLE = (
    EVENTS_DEDUP_LATE_SQL
    .replace("unix_seconds(ts)", "epoch(ts)")
    .replace(" div ", " // ")
)


# --- grouping-key skew diagnostic ---
#
# The measurement that decides whether a job needs salting, AQE skew
# splitting, or nothing (the reference salts blindly — SURVEY §4
# argues measure-first): per-key count distribution stats plus the
# deterministic argmax key, all computed on the |keys|-sized counts
# frame after the one shuffle the real aggregation would pay anyway.

def events_key_skew(spark, sf_dir):
    from ..operators.windows import key_skew_report

    return key_skew_report(
        load(spark, sf_dir, "events"), ["user_id", "event_type"]
    )


EVENTS_KEY_SKEW_ORACLE = """
WITH counts AS (
  SELECT concat_ws(chr(31), CAST(user_id AS VARCHAR),
                   CAST(event_type AS VARCHAR)) AS key_str,
         count(*) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS total_rows,
       CAST(max(cnt) AS BIGINT) AS max_cnt,
       CAST(quantile_cont(cnt, 0.5) AS DOUBLE) AS p50_cnt,
       CAST(quantile_cont(cnt, 0.99) AS DOUBLE) AS p99_cnt,
       floor(CAST(max(cnt) AS DOUBLE)
             / (CAST(sum(cnt) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000
         AS skew_ratio,
       substr(max(lpad(CAST(cnt AS VARCHAR), 12, '0') || key_str), 13)
         AS top_key
FROM counts
"""


QUERIES = [
    Query("hot_items_topn", hot_items_topn, HOT_ITEMS_ORACLE, "W1 A1 G1 G2 R1 R4"),
    Query("hot_items_report", hot_items_report, HOT_ITEMS_REPORT_ORACLE, "P6 sink formatting"),
    Query("hot_items_sql", hot_items_sql, HOT_ITEMS_SQL_ORACLE, "A10 R3 F6 §2.11"),
    Query("page_views", page_views, PAGE_VIEWS_ORACLE, "W5 A8 P3 F1"),
    Query("unique_visitors", unique_visitors, UNIQUE_VISITORS_ORACLE, "W6 A6 G8"),
    Query("uv_approx", uv_approx, None, "A7 W10"),  # HLL++ — no exact oracle
    Query("uv_approx_check", uv_approx_check, UV_APPROX_CHECK_ORACLE, "A7 property oracle"),
    # Bloom membership-dedup twin: fpp-free at oracle scale (see docstring)
    Query("uv_bloom", uv_bloom, UNIQUE_VISITORS_ORACLE, "A7 K3 fidelity"),
    Query("channel_stats", channel_stats, CHANNEL_STATS_ORACLE, "W3 A3 G5 F4"),
    Query("global_stats", global_stats, GLOBAL_STATS_ORACLE, "A4 G4 G8"),
    Query("global_stats_fine", global_stats_fine, GLOBAL_STATS_FINE_ORACLE, "A9 W3 scale-path"),
    Query("orders_daily_by_priority", orders_daily_by_priority, ORDERS_DAILY_ORACLE, "W4 A5 G7"),
    Query("hot_sources_topn", hot_sources_topn, HOT_SOURCES_ORACLE, "F2 F3 R2 G3"),
    Query("high_value_purchases", high_value_purchases, HIGH_VALUE_ORACLE, "P1 P2 P5 F1-F5"),
    Query("events_dedup_late", events_dedup_late, EVENTS_DEDUP_LATE_ORACLE,
          "ext: dropDuplicatesWithinWatermark batch twin (first-arrival dedup)"),
    Query("events_key_skew", events_key_skew, EVENTS_KEY_SKEW_ORACLE,
          "ext: grouping-key skew diagnostic (measure-first salting)"),
]


# --- native Datasketches HLL: per-type distinct users via sub-sketch rollup ---
#
# Rows-only: hll_sketch_estimate is deterministic for fixed data but
# Datasketches-internal (DuckDB's approx_distinct is a different
# sketch); the bounds and the lossless-union property are pinned by
# tests/test_properties.py.

def uv_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_rollup

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_seconds("ts") / 604800).cast("long").alias("week"),
        "user_id",
    )
    return hll_rollup(ev, "event_type", "week", "user_id").select(
        F.col("s").alias("event_type"), "n_subs", "est_distinct"
    )


QUERIES.append(
    Query(
        "uv_hll_rollup",
        uv_hll_rollup,
        None,
        "ext: native Datasketches HLL sub-sketch rollup (lossless union)",
    )
)
