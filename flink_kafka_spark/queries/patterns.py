"""Pattern-detection query family (SURVEY.md §2.10 T1-T5) on `events`.

Mappings onto the driver's tables:
- login-fail  → two consecutive 'error' events per user within 30 min
  (reference: 2 consecutive fails within 2 s, LoginFailWithCep.java);
- order-timeout → each 'click' (create) matched to the user's next
  'purchase' (pay) within 30 min (reference: create→pay within 15 min,
  OrderPayTimeOut.java / OrderTimeOutOnProcess.java);
- blacklist  → users with > 3 'click' events in a day
  (reference: > 100 ad clicks per user×ad per day,
  AdStatisticsByProvince.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.patterns import (
    consecutive_event_alert,
    count_threshold_blacklist,
    create_pay_timeout,
)
from ..tables import load
from . import Query

LOGIN_FAIL_GAP_S = 1800
ORDER_TIMEOUT_S = 1800
BLACKLIST_THRESHOLD = 3


def login_fail_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return consecutive_event_alert(
        events, "user_id", "ts", "event_type", "error", LOGIN_FAIL_GAP_S, "event_id"
    )


LOGIN_FAIL_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         lag(event_type) OVER w AS prev_type,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS prev_ts_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
       prev_ts_s AS first_fail_ts_s,
       ts_s AS second_fail_ts_s,
       '2 consecutive ''error'' within {LOGIN_FAIL_GAP_S}s' AS warning
FROM seq
WHERE event_type = 'error' AND prev_type = 'error'
  AND ts_s - prev_ts_s <= {LOGIN_FAIL_GAP_S}
"""


def order_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return create_pay_timeout(
        events, "user_id", "ts", "event_type", "click", "purchase", ORDER_TIMEOUT_S, "event_id"
    )


ORDER_TIMEOUT_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         min(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_pay_ts_s
  FROM events
)
SELECT user_id,
       ts_s AS create_ts_s,
       next_pay_ts_s AS pay_ts_s,
       CASE WHEN next_pay_ts_s IS NOT NULL
                 AND next_pay_ts_s - ts_s <= {ORDER_TIMEOUT_S}
            THEN 'payed' ELSE 'timeout' END AS result_state
FROM seq WHERE event_type = 'click'
"""


def click_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return count_threshold_blacklist(
        events.filter(F.col("event_type") == "click"), ["user_id"], "ts", BLACKLIST_THRESHOLD
    ).select("user_id", "day", "cnt", "warning")


BLACKLIST_ORACLE = f"""
SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt,
       'click >= {BLACKLIST_THRESHOLD + 1} today' AS warning
FROM events WHERE event_type = 'click'
GROUP BY 1, 2
HAVING count(*) > {BLACKLIST_THRESHOLD}
"""


# --- sessionization (extension: guide "Common OLAP patterns") ---

def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min inactivity): lag + cumulative
    sum of gap-breaks per user — the batch equivalent of
    session_window(). One shuffle on user_id."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(SESSIONIZE_SQL)


# Identical ANSI text runs on Spark and DuckDB. The lag and the
# cumsum share ONE total order (full-precision ts + event_id — the
# session_windows_native oracle's rule): ordering the cumsum by
# truncated ts_s alone lets two same-second events at a session
# boundary reorder between the two windows, and each engine may then
# hand the unflagged peer a DIFFERENT session id (the hazardous
# configuration exists in the sf0.1 fixture: user 1061 has two
# sub-second-apart events in one second right after a >gap silence).
SESSIONIZE_SQL = """
WITH seq AS (
  SELECT user_id, ts, event_id,
         CAST(ts AS DATE) AS day,
         CAST(floor(unix_seconds(ts)) AS BIGINT) AS ts_s,
         lag(CAST(floor(unix_seconds(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts_s
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_ts_s IS NULL OR ts_s - prev_ts_s > 1800
                 THEN 1 ELSE 0 END AS new_session
  FROM seq
),
sessions AS (
  SELECT user_id, ts_s,
         -- BIGINT cast: DuckDB integer sum() is HUGEINT (-> float64 in
         -- pandas) while Spark is already BIGINT; same text both engines
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       count(*) AS n_events,
       max(ts_s) - min(ts_s) AS duration_s
FROM sessions GROUP BY 1, 2
"""

SESSIONIZE_ORACLE = SESSIONIZE_SQL.replace("unix_seconds(ts)", "epoch(ts)")


# --- native session windows (session_window operator) ---
#
# The same 30-min-gap sessions as :func:`sessionize`, through Spark's
# built-in ``session_window`` operator instead of the lag+cumsum
# islands plan — the operator a Structured Streaming job would use
# (sessionize's plan is batch-only: lag over an unbounded partition
# has no incremental form). Boundary semantics verified by crafted
# test: session_window MERGES windows that touch (a gap of exactly
# the timeout stays one session), i.e. the break condition is
# `diff > gap` — the same islands grouping sessionize uses.
# Events are truncated to whole seconds BEFORE windowing so the
# engine-side microsecond arithmetic matches the epoch-second oracle
# exactly. One shuffle on user_id + the in-partition merge pass.

SESSION_GAP_S = 1800


def session_windows_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("tsec"),
    )
    return (
        ev.groupBy("user_id", F.session_window("tsec", f"{SESSION_GAP_S} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("session_window.start").alias("session_start_s"),
            F.unix_timestamp("session_window.end").alias("session_end_s"),
            "n_events",
        )
    )


# The lag and the cumsum share ONE total order (full-precision ts +
# event_id tiebreak): ordering the cumsum by truncated ts_s alone
# would let two same-second events at a session boundary reorder
# between the two windows and mis-assign the unflagged peer to the
# previous session. Gap arithmetic still uses truncated seconds
# (Spark truncates before windowing), and ts-order is a refinement
# of ts_s-order, so the session grouping itself is unchanged.
SESSION_NATIVE_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts_s
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_ts_s IS NULL OR ts_s - prev_ts_s > {SESSION_GAP_S}
                 THEN 1 ELSE 0 END AS new_session
  FROM seq
),
sessions AS (
  SELECT user_id, ts_s,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM marked
)
SELECT user_id,
       min(ts_s) AS session_start_s,
       max(ts_s) + {SESSION_GAP_S} AS session_end_s,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


QUERIES = [
    Query("login_fail_detect", login_fail_detect, LOGIN_FAIL_ORACLE, "T1 T2 W8"),
    Query("order_timeout", order_timeout, ORDER_TIMEOUT_ORACLE, "T3 T4"),
    Query("click_blacklist", click_blacklist, BLACKLIST_ORACLE, "T5 F7 G6 W12"),
    Query("sessionize", sessionize, SESSIONIZE_ORACLE, "extension: sessionization"),
    Query("session_windows_native", session_windows_native, SESSION_NATIVE_ORACLE,
          "W-family: built-in session_window operator (streaming-capable plan)"),
]


def funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step CEP funnel (extension of T1/T3 to a generic matcher):
    view → click → purchase per user, skip-till-next (each step is the
    earliest event after the previous), whole chain within 1 day (the events table spans ~30 days, so hour-scale chains are vanishingly rare)."""
    from ..operators.patterns import match_sequence

    return match_sequence(
        load(spark, sf_dir, "events"),
        key="user_id",
        ts_col="ts",
        steps=[
            ("view", "event_type = 'view'"),
            ("click", "event_type = 'click'"),
            ("purchase", "event_type = 'purchase'"),
        ],
        within_s=86400,
        contiguity="relaxed",
    )


FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_type FROM events
),
m0 AS (SELECT user_id, ts_s AS ts_view FROM e WHERE event_type = 'view'),
m1 AS (
  SELECT m0.user_id, ts_view, min(e.ts_s) AS ts_click
  FROM m0 JOIN e ON e.user_id = m0.user_id
   AND e.event_type = 'click' AND e.ts_s > m0.ts_view
  GROUP BY 1, 2
),
m2 AS (
  SELECT m1.user_id, ts_view, ts_click, min(e.ts_s) AS ts_purchase
  FROM m1 JOIN e ON e.user_id = m1.user_id
   AND e.event_type = 'purchase' AND e.ts_s > m1.ts_click
  GROUP BY 1, 2, 3
)
SELECT user_id, ts_view, ts_click, ts_purchase
FROM m2 WHERE ts_purchase - ts_view <= 86400
"""

QUERIES.append(
    Query(
        "funnel_conversions",
        funnel_conversions,
        FUNNEL_ORACLE,
        "T1 T3 generalized: k-step CEP matcher",
    )
)
