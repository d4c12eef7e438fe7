"""End-to-end parity on the reference's OWN checked-in fixtures
(read-only under /root/reference — used as test DATA only).

These drive the engine's pipelines over the exact inputs the reference
ran (SURVEY.md §5.2) and check the results against an independent
DuckDB computation of the same semantics:

- hot pages (HotPages.java): apache.log, 10,000 real log lines —
  GET + static-asset-regex filter, sliding 10min/5s per-url counts,
  top-3 per window;
- login-fail (LoginFail.java): LoginLog.csv, 48 rows — consecutive
  fails within 2 s per user;
- ad clicks per province (AdStatisticsByProvince.java):
  AdClickLog.csv, 142 rows — sliding 1h/5min per-province counts.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_kafka_spark.operators.patterns import consecutive_event_alert
from flink_kafka_spark.operators.topn import topn_counts_per_window
from flink_kafka_spark.operators.windows import windowed_count
from flink_kafka_spark.schemas import AD_CLICK, LOGIN_EVENT, parse_apache_log_lines, parse_csv_lines

REF = "/root/reference/UserBehaviorAnalysis"
APACHE_LOG = f"{REF}/NetworkFlowAnalysis/src/main/resources/apache.log"
LOGIN_LOG = f"{REF}/LoginFailDetect/src/main/resources/LoginLog.csv"
AD_LOG = f"{REF}/MarketAnalysis/src/main/resources/AdClickLog.csv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)


def _hop_windows(ts_s_expr: str, size_s: int, slide_s: int) -> str:
    n = size_s // slide_s
    return (
        f"CAST(floor(({ts_s_expr}) / {slide_s}) AS BIGINT) * {slide_s} - g.i * {slide_s}"
    ), n


def test_hot_pages_parity_on_apache_log(spark):
    parsed = parse_apache_log_lines(spark.read.text(APACHE_LOG))
    filtered = parsed.filter(
        (F.col("method") == "GET") & ~F.col("url").rlike(r"\.(css|js|png|ico)$")
    )
    counts = windowed_count(filtered, "ts", "10 minutes", "5 seconds", keys=["url"])
    got = sorted(
        map(
            tuple,
            topn_counts_per_window(counts, "url", 3)
            .select("window_start_s", "window_end_s", "url", "cnt", "rank")
            .collect(),
        )
    )

    con = duckdb.connect()
    start_expr, n = _hop_windows("epoch(strptime(ts, '%d/%m/%Y:%H:%M:%S'))", 600, 5)
    want = con.execute(f"""
        WITH raw AS (
          SELECT * FROM read_csv('{APACHE_LOG}', delim=' ', header=false,
            columns={{'ip':'VARCHAR','d1':'VARCHAR','d2':'VARCHAR','ts':'VARCHAR',
                      'zone':'VARCHAR','method':'VARCHAR','url':'VARCHAR'}})
          WHERE method = 'GET' AND NOT regexp_matches(url, '\\.(css|js|png|ico)$')
        ),
        hopped AS (
          SELECT url, {start_expr} AS ws FROM raw CROSS JOIN range({n}) g(i)
        ),
        counts AS (
          SELECT ws, ws + 600 AS we, url, count(*) AS cnt FROM hopped GROUP BY 1, 2, 3
        )
        SELECT ws, we, url, cnt, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY ws ORDER BY cnt DESC, url ASC) AS rank
          FROM counts
        ) WHERE rank <= 3
    """).fetchall()
    assert got == sorted(map(tuple, want))
    assert len(got) > 0


def test_login_fail_parity_on_login_log(spark):
    events = parse_csv_lines(spark.read.text(LOGIN_LOG), LOGIN_EVENT)
    got = sorted(
        map(
            tuple,
            consecutive_event_alert(
                events, "user_id", "ts", "login_state", "fail", 2, "ip"
            ).select("user_id", "first_fail_ts_s", "second_fail_ts_s").collect(),
        )
    )
    con = duckdb.connect()
    want = con.execute(f"""
        WITH ev AS (
          SELECT CAST(column0 AS BIGINT) AS user_id, column1 AS ip,
                 column2 AS state, CAST(column3 AS BIGINT) AS ts_s
          FROM read_csv('{LOGIN_LOG}', header=false, delim=',',
                        columns={{'column0':'VARCHAR','column1':'VARCHAR',
                                  'column2':'VARCHAR','column3':'VARCHAR'}})
        ),
        seq AS (
          SELECT user_id, state, ts_s,
                 lag(state) OVER w AS prev_state, lag(ts_s) OVER w AS prev_ts
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s ASC, ip ASC)
        )
        SELECT user_id, prev_ts, ts_s FROM seq
        WHERE state = 'fail' AND prev_state = 'fail' AND ts_s - prev_ts <= 2
    """).fetchall()
    assert got == sorted(map(tuple, want))
    assert len(got) > 0


def test_ad_province_parity_on_ad_click_log(spark):
    clicks = parse_csv_lines(spark.read.text(AD_LOG), AD_CLICK)
    got = sorted(
        map(
            tuple,
            windowed_count(clicks, "ts", "1 hour", "5 minutes", keys=["province"])
            .select("window_start_s", "window_end_s", "province", "cnt")
            .collect(),
        )
    )
    con = duckdb.connect()
    start_expr, n = _hop_windows("ts_s", 3600, 300)
    want = con.execute(f"""
        WITH raw AS (
          SELECT column2 AS province, CAST(column4 AS BIGINT) AS ts_s
          FROM read_csv('{AD_LOG}', header=false, delim=',',
                        columns={{'column0':'VARCHAR','column1':'VARCHAR','column2':'VARCHAR',
                                  'column3':'VARCHAR','column4':'VARCHAR'}})
        ),
        hopped AS (
          SELECT province, {start_expr} AS ws FROM raw CROSS JOIN range({n}) g(i)
        )
        SELECT ws, ws + 3600 AS we, province, count(*) AS cnt
        FROM hopped GROUP BY 1, 2, 3
    """).fetchall()
    assert got == sorted(map(tuple, want))
    assert len(got) > 0
