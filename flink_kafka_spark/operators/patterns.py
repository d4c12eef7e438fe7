"""CEP-style sequence detection, batch path (SURVEY.md §2.10 T1-T5).

Flink expresses these with keyed state + timers or the CEP library
(``LoginFailWithCep.java:52-97``, ``OrderPayTimeOut.java:56-114``,
``OrderTimeOutOnProcess.java:63-146``, ``AdStatisticsByProvince.java:
104-160``). Spark has no CEP library; on the batch path the same
semantics are ordinary window functions — which Catalyst runs as a
single sort within each key partition, no per-row state machine:

- strict contiguity (`next`)   → ``lag`` over (key ORDER BY ts): the
  previous row in the key's sequence IS the contiguous predecessor;
- `followedBy ... within t`    → "earliest matching event after me"
  via a forward-looking windowed ``min``;
- count-threshold blacklisting → per-key-per-day counts + threshold.

The streaming path re-implements T1-T4 with per-key state in
``flink_kafka_spark.streaming.stateful`` (applyInPandasWithState).

Scale notes: each detector is one shuffle on the detection key; window
functions sort per key partition only (no global sort). Per-user event
sequences are assumed to fit a partition — true for behavioral data
(hot users ≪ partition size); a pathological single-key skew would be
handled by AQE or a two-level (key, day) repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def consecutive_event_alert(
    df: DataFrame,
    key: str,
    ts_col: str,
    match_col: str,
    match_value: str,
    max_gap_s: int,
    order_tiebreak: str,
) -> DataFrame:
    """T1/T2: alert when two *consecutive* events for a key both match
    ``match_value`` within ``max_gap_s`` seconds (strict contiguity —
    any intervening non-matching event resets, exactly like Flink CEP's
    ``next`` in LoginFailWithCep.java:57-63)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
    ts_s = F.col(ts_col).cast("long")
    return (
        df.withColumn("_prev_match", F.lag(match_col).over(w))
        .withColumn("_prev_ts_s", F.lag(ts_s).over(w))
        .filter(
            (F.col(match_col) == match_value)
            & (F.col("_prev_match") == match_value)
            & (ts_s - F.col("_prev_ts_s") <= max_gap_s)
        )
        .select(
            F.col(key),
            F.col("_prev_ts_s").alias("first_fail_ts_s"),
            ts_s.alias("second_fail_ts_s"),
            F.lit(f"2 consecutive '{match_value}' within {max_gap_s}s").alias("warning"),
        )
    )


def create_pay_timeout(
    df: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    create_value: str,
    pay_value: str,
    timeout_s: int,
    order_tiebreak: str,
) -> DataFrame:
    """T3/T4: per key, match each ``create`` with the earliest ``pay``
    that follows it; classify as 'payed' (within timeout) or 'timeout'.

    Reference semantics: OrderPayTimeOut.java:56-83 (CEP followedBy/
    within, relaxed contiguity — intervening events allowed) and the
    procedural state machine OrderTimeOutOnProcess.java:63-146.

    Implementation: forward-looking windowed min over the key's
    time-ordered sequence — ``min(pay_ts) over (... ROWS BETWEEN
    CURRENT ROW AND UNBOUNDED FOLLOWING)`` — one shuffle + one per-key
    sort, no state machine, no self-join.
    """
    ts_s = F.col(ts_col).cast("long")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col(order_tiebreak).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pay_ts = F.min(F.when(F.col(type_col) == pay_value, ts_s)).over(w)
    return (
        df.withColumn("_ts_s", ts_s)
        .withColumn("_next_pay_ts_s", pay_ts)
        .filter(F.col(type_col) == create_value)
        .select(
            F.col(key),
            F.col("_ts_s").alias("create_ts_s"),
            F.col("_next_pay_ts_s").alias("pay_ts_s"),
            F.when(
                F.col("_next_pay_ts_s").isNotNull()
                & (F.col("_next_pay_ts_s") - F.col("_ts_s") <= timeout_s),
                F.lit("payed"),
            )
            .otherwise(F.lit("timeout"))
            .alias("result_state"),
        )
    )


def count_threshold_blacklist(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    threshold: int,
) -> DataFrame:
    """T5: the click-fraud blacklist (AdStatisticsByProvince.java:
    104-160) — count events per key-combination per day; emit one
    warning row per (keys, day) whose count exceeds the threshold.
    The daily processing-time reset timer becomes a group-by on the
    event's date — state is bounded by construction."""
    day = F.col(ts_col).cast("date").alias("day")
    return (
        df.groupBy(*keys, day)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold)
        .withColumn("warning", F.concat(F.lit("click >= "), F.lit(threshold + 1), F.lit(" today")))
    )


def match_sequence(
    df: DataFrame,
    key: str,
    ts_col: str,
    steps: list[tuple[str, str]],
    within_s: int,
    contiguity: str = "relaxed",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Generic CEP sequence matcher — the reusable form of Flink CEP's
    ``Pattern.begin(p0).next/followedBy(p1)...within(t)`` surface
    (LoginFailWithCep.java:52-76 strict; OrderPayTimeOut.java:56-70
    relaxed), for any number of steps.

    ``steps`` is an ordered list of (name, SQL boolean expression over
    the row); the output has one row per completed chain with columns
    ``key, ts_<name>...`` (epoch seconds per matched step).

    - ``contiguity='strict'`` (Flink ``next``): the steps must be
      consecutive events of the key — one window pass; step i's flag
      is read at ``lead(i)``, so the whole match costs a single
      per-key sort, no joins. Requires ``order_tiebreak`` for a total
      event order.
    - ``contiguity='relaxed'`` (Flink ``followedBy``, skip-till-next):
      step i matches the EARLIEST event strictly after step i-1's
      event. k-1 equi-joins on the key, each immediately reduced by a
      min-aggregate — all shuffles share the key partitioning, and
      each join's build side is only that step's filtered events, so
      at 100 TB the cost is k passes over pre-filtered slices, never
      a per-row state machine.

    ``within_s`` bounds the whole chain (last - first), matching
    Flink's window-per-match semantics.
    """
    ts_s = F.expr(f"CAST(floor(unix_seconds({ts_col})) AS BIGINT)")
    names = [n for n, _ in steps]
    out_cols = [f"ts_{n}" for n in names]
    if contiguity == "strict":
        if order_tiebreak is None:
            raise ValueError("strict contiguity needs order_tiebreak for a total order")
        w = Window.partitionBy(key).orderBy(
            F.col(ts_col).asc(), F.col(order_tiebreak).asc()
        )
        flagged = df.select(
            F.col(key),
            F.col(ts_col),
            ts_s.alias("_ts_s"),
            F.col(order_tiebreak),
            *[F.expr(p).alias(f"_m_{i}") for i, (_, p) in enumerate(steps)],
        )
        cond = F.col("_m_0")
        sel = [F.col(key), F.col("_ts_s").alias(out_cols[0])]
        for i in range(1, len(steps)):
            cond = cond & F.coalesce(F.lead(f"_m_{i}", i).over(w), F.lit(False))
            sel.append(F.lead("_ts_s", i).over(w).alias(out_cols[i]))
        return (
            flagged.select(F.col(key), F.col("_ts_s"), cond.alias("_ok"), *sel[1:])
            .filter(F.col("_ok") & (F.col(out_cols[-1]) - F.col(out_cols[0]) <= within_s))
            .select(key, *out_cols)
        )
    m = df.filter(F.expr(steps[0][1])).select(F.col(key), ts_s.alias(out_cols[0]))
    for i, (_, pred) in enumerate(steps[1:], start=1):
        s = df.filter(F.expr(pred)).select(F.col(key), ts_s.alias("_ts"))
        prev = out_cols[:i]
        m = (
            m.join(s, key)
            .filter(F.col("_ts") > F.col(prev[-1]))
            .groupBy(key, *prev)
            .agg(F.min("_ts").alias(out_cols[i]))
        )
    return m.filter(F.col(out_cols[-1]) - F.col(out_cols[0]) <= within_s).select(
        key, *out_cols
    )
