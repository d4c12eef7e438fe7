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
