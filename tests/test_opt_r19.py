"""Round-19 optimization identity pins.

Every optimization this round restructures HOW a result is computed,
never WHAT it is — these tests pin the identities the round's changes
rely on, operator by operator (the r18 test_opt_r18.py discipline).
"""

import pytest

from flink_kafka_spark.operators.dedup import shingle_sets
from flink_kafka_spark.tables import load


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestUnspreadVerifyPass:
    """r19: the LSH verification passes (candidate-bounded by the
    semi-filter) no longer take the layout spread — spread=False must
    be a pure plan change, row-identical to the spread path."""

    def test_shingle_sets_spread_flag_row_identity(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        assert _rows(shingle_sets(docs, "doc_id", spread=False)) == _rows(
            shingle_sets(docs, "doc_id", spread=True)
        )

    def test_unspread_plan_has_no_round_robin(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        plan = shingle_sets(docs, "doc_id", spread=False)._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" not in plan
        plan_spread = shingle_sets(docs, "doc_id", spread=True)._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" in plan_spread
