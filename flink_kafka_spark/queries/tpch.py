"""Batch-relational query family (TPC-H-style) on the driver's tables.

The reference has no batch joins or multi-agg queries — Spark gets
broadcast/sort-merge joins, partial aggregation, predicate pushdown and
column pruning for free (SURVEY.md §2.9 note, §4). These queries are
the engine's headline batch path and the primary bench workload:

- q1: wide aggregation (8 aggs, 2 group keys) — partial-agg heavy;
- q3: 3-table join + agg — customer broadcast;
- q5: 5-table star join — region/nation broadcast, AQE reorders;
- q6: selective scan-agg — predicate pushdown to parquet.

Cross-engine determinism: money math is done in DECIMAL (exact sums,
identical half-away-from-zero rounding on the final cast in both Spark
and DuckDB — double sums are order-dependent and round() semantics
diverge at decimal half-points). Averages are derived from the exact
decimal sums with an explicit floor-based half-up, which is a pure
function of identical doubles on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import Query

# money columns as exact decimals — precisions kept tight so products
# never exceed precision 38 (overflow triggers engine-specific scale
# reduction: Spark and DuckDB round differently there)
_EP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_TAX = "CAST(l_tax AS DECIMAL(4,2))"
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
_DISC_PRICE = f"{_EP} * (1 - {_DISC})"
_CHARGE = f"{_EP} * (1 - {_DISC}) * (1 + {_TAX})"


def _avg4(sum_expr: str, cnt: str = "count(*)") -> str:
    """Deterministic 4-dp half-up average from an exact decimal sum."""
    return f"floor(CAST({sum_expr} AS DOUBLE) / {cnt} * 10000 + 0.5) / 10000"


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"CAST(round(sum({_QTY}), 2) AS DECIMAL(18,2))").alias("sum_qty"),
            F.expr(f"CAST(round(sum({_EP}), 2) AS DECIMAL(18,2))").alias("sum_base_price"),
            F.expr(f"CAST(round(sum({_DISC_PRICE}), 2) AS DECIMAL(18,2))").alias("sum_disc_price"),
            F.expr(f"CAST(round(sum({_CHARGE}), 2) AS DECIMAL(18,2))").alias("sum_charge"),
            F.expr(_avg4(f"sum({_QTY})")).alias("avg_qty"),
            F.expr(_avg4(f"sum({_EP})")).alias("avg_price"),
            F.expr(_avg4(f"sum({_DISC})")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TPCH_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(round(sum({_QTY}), 2) AS DECIMAL(18,2)) AS sum_qty,
       CAST(round(sum({_EP}), 2) AS DECIMAL(18,2)) AS sum_base_price,
       CAST(round(sum({_DISC_PRICE}), 2) AS DECIMAL(18,2)) AS sum_disc_price,
       CAST(round(sum({_CHARGE}), 2) AS DECIMAL(18,2)) AS sum_charge,
       {_avg4(f"sum({_QTY})")} AS avg_qty,
       {_avg4(f"sum({_EP})")} AS avg_price,
       {_avg4(f"sum({_DISC})")} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"CAST(round(sum({_DISC_PRICE}), 2) AS DECIMAL(18,2))").alias("revenue"))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("long").alias("orderdate_s"),
            "o_orderpriority",
            "revenue",
        )
    )


TPCH_Q3_ORACLE = f"""
SELECT o_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate_s,
       o_orderpriority,
       CAST(round(sum({_DISC_PRICE}), 2) AS DECIMAL(18,2)) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
"""


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: revenue per nation for one region. region/nation are
    broadcast (tiny dims); customer⋈orders⋈lineitem carry the shuffles
    on their keys."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(f"CAST(round(sum({_DISC_PRICE}), 2) AS DECIMAL(18,2))").alias("revenue"))
    )


TPCH_Q5_ORACLE = f"""
SELECT n_name,
       CAST(round(sum({_DISC_PRICE}), 2) AS DECIMAL(18,2)) AS revenue
FROM region, nation, customer, orders, lineitem
WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
"""


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(f"CAST(round(sum({_EP} * {_DISC}), 4) AS DECIMAL(18,4))").alias("revenue"))
    )


TPCH_Q6_ORACLE = f"""
SELECT CAST(round(sum({_EP} * {_DISC}), 4) AS DECIMAL(18,4)) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


QUERIES = [
    Query("tpch_q1", tpch_q1, TPCH_Q1_ORACLE, "batch agg (beyond ref)", ("bench",)),
    Query("tpch_q3", tpch_q3, TPCH_Q3_ORACLE, "batch join+agg (beyond ref)", ("bench",)),
    Query("tpch_q5", tpch_q5, TPCH_Q5_ORACLE, "batch star join (beyond ref)", ("bench",)),
    Query("tpch_q6", tpch_q6, TPCH_Q6_ORACLE, "batch scan-agg (beyond ref)", ("bench",)),
]
