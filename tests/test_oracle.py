"""Every registered query with an oracle must match DuckDB at sf0.001
(the driver runs the same comparison at sf0.01). Oracle-less queries
get a runs-and-returns-rows smoke check."""

import pytest

from flink_kafka_spark.queries import all_queries

from .oracle_util import compare_spark_duckdb

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        rows = df.collect()
        assert rows is not None  # runs; emptiness checked per-op elsewhere
    else:
        compare_spark_duckdb(df, q.oracle, sf_dir)


@pytest.mark.parametrize(
    "spark_sql,oracle_sql",
    [
        # int64 vs DuckDB HUGEINT->float64 (sessionize/tpch_q12 class)
        ("SELECT CAST(5 AS BIGINT) AS x", "SELECT sum(x) AS x FROM (SELECT 5 AS x)"),
        # Spark Decimal object vs float64, trailing zero (tpch_q1 class)
        ("SELECT CAST(1.40 AS DECIMAL(18,2)) AS x", "SELECT 1.4::DOUBLE AS x"),
        # plain value mismatch must still fail
        ("SELECT 1 AS x", "SELECT 2 AS x"),
    ],
)
def test_harness_rejects_dtype_drift(spark, sf_dir, spark_sql, oracle_sql):
    """The round-1 bug class (rows+schema match, driver hash fails) must
    be locally reproducible: a deliberately mis-typed pair fails."""
    with pytest.raises(AssertionError):
        compare_spark_duckdb(spark.sql(spark_sql), oracle_sql, sf_dir)
