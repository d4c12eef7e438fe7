"""Storage-side scale levers: partition pruning and bucketed
exchange-free joins — asserted from the physical plan, not just
results."""

import pytest
from pyspark.sql import functions as F

from flink_kafka_spark.io import read_table, write_bucketed, write_partitioned
from flink_kafka_spark.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["o_year"])
    back = spark.read.parquet(path).filter(F.col("o_year") == 1996)
    got = back.count()
    want = orders.filter(F.col("o_year") == 1996).count()
    assert got == want > 0
    # pruned scan reads only the matching partition directory
    scan = [l for l in _plan(back).splitlines() if "Scan parquet" in l or "PartitionFilters" in l]
    assert any("o_year" in l for l in _plan(back).splitlines()), scan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "orders_b", ["o_orderkey"], 8, ["o_orderkey"], path=str(wh / "o"))
    write_bucketed(l, "lineitem_b", ["l_orderkey"], 8, ["l_orderkey"], path=str(wh / "l"))
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    o = read_table(spark, ot)
    l = read_table(spark, lt)
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = _plan(joined)
        # bucket co-location: no shuffle exchange below the join
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # correctness unchanged vs unbucketed
        want = (
            load(spark, sf_dir, "lineitem")
            .join(load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
