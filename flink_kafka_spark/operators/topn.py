"""Per-window Top-N ranking (SURVEY.md §2.8 R1-R4).

The reference implements Top-N procedurally: buffer a window's rows in
keyed ListState/MapState, fire an event-time timer at windowEnd+1, sort
in-memory, take N (``HotItems.java:140-197``, ``HotPages.java:128-198``)
— and also shows the declarative form, a ROW_NUMBER OVER
(PARTITION BY window ORDER BY cnt DESC) subquery filter
(``HotItemsWithSql.java:73-76``). Spark-first, the declarative form IS
the implementation: a rank window function over the window key.

Scale notes: ``row_number`` per window-partition is a single shuffle on
the partition key; no global sort ever happens. Ties are broken by
explicit tiebreaker columns so results are deterministic (the reference
relies on parallelism-1 instead — SURVEY.md §4)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topn_per_partition(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-n rows per partition, with a deterministic rank."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def topn_counts_per_window(
    df_counts: DataFrame,
    key_col: str,
    n: int,
) -> DataFrame:
    """Reference R1/R2/R3: given windowed counts (window_start_s,
    window_end_s, key, cnt), rank keys per window by count desc.
    Tiebreak on the key ascending for determinism."""
    return topn_per_partition(
        df_counts,
        ["window_start_s", "window_end_s"],
        [F.col("cnt").desc(), F.col(key_col).asc()],
        n,
    )


def format_topn_report(
    ranked: DataFrame,
    key_col: str,
    rank_col: str = "rank",
    cnt_col: str = "cnt",
) -> DataFrame:
    """P6 (HotItems.java:177-195): render each window's ranking as the
    reference's human-readable report block — one string row per
    window:

        ==== window <start_s>-<end_s> ====
        No1: <key>=<id> cnt=<n>
        No2: ...

    Window bounds stay epoch seconds (the engine's P5 convention).
    Implementation is pure aggregation-side string building:
    collect_list of (rank, line) structs per window, sort_array for
    rank order (collect_list has no ordering guarantee), array_join —
    one shuffle on the window key, all JVM-side."""
    line = F.concat(
        F.lit("No"), F.col(rank_col).cast("string"),
        F.lit(f": {key_col}="), F.col(key_col).cast("string"),
        F.lit(" cnt="), F.col(cnt_col).cast("string"),
    )
    entries = F.sort_array(
        F.collect_list(F.struct(F.col(rank_col).alias("r"), line.alias("l")))
    )
    return (
        ranked.groupBy("window_start_s", "window_end_s")
        .agg(entries.alias("_e"))
        .select(
            "window_start_s",
            "window_end_s",
            F.concat(
                F.lit("==== window "),
                F.col("window_start_s").cast("string"),
                F.lit("-"),
                F.col("window_end_s").cast("string"),
                F.lit(" ====\n"),
                F.array_join(F.expr("transform(_e, e -> e.l)"), "\n"),
            ).alias("report"),
        )
    )
