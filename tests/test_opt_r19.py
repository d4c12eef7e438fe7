"""Round-19 optimization identity pins.

Every optimization this round restructures HOW a result is computed,
never WHAT it is — these tests pin the identities the round's changes
rely on, operator by operator (the r18 test_opt_r18.py discipline).
"""

import pytest

from flink_kafka_spark.operators.dedup import shingle_sets
from flink_kafka_spark.operators.text import (
    bpe_apply_merges,
    bpe_learn_merges,
    bpe_train_and_tokenize,
)
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


class TestBpeTrainAndTokenize:
    """r19: bpe_tokenize_stats reuses the trainer's final vocabulary
    state instead of re-deriving it merge-layer by merge-layer. The
    fused composition must be row-identical to the two-step one
    (learn, collect the table, apply) — including the learned merge
    table itself when state is requested."""

    def test_fused_equals_two_step_composition(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        merges = [
            (r["left"], r["right"])
            for r in bpe_learn_merges(docs, n_merges=8).collect()
        ]
        two_step = _rows(bpe_apply_merges(docs, merges))
        fused = _rows(bpe_train_and_tokenize(docs, n_merges=8))
        assert fused == two_step

    def test_state_request_leaves_merge_table_unchanged(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        plain = _rows(bpe_learn_merges(docs, n_merges=4))
        with_state, state = bpe_learn_merges(
            docs, n_merges=4, return_vocab_state=True
        )
        assert _rows(with_state) == plain
        # the state is the vocabulary with every merge applied: its
        # token counts must match applying the merge table from scratch
        from pyspark.sql import functions as F

        merges = [(r[1], r[2]) for r in plain]
        via_state = _rows(state.select("w", F.size("syms").alias("n")))
        sym0 = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        from flink_kafka_spark.operators.text import _bpe_merge_step, _bpe_words

        vocab = _bpe_words(docs, "doc_id", "text").select("w").distinct().select(
            "w", sym0.alias("_s")
        )
        for left, right in merges:
            vocab = vocab.select("w", _bpe_merge_step("_s", left, right).alias("_s"))
        from_scratch = _rows(vocab.select("w", F.size("_s").alias("n")))
        assert via_state == from_scratch

    def test_empty_corpus_state(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        table, state = bpe_learn_merges(docs, n_merges=3, return_vocab_state=True)
        assert table.count() == 0
        assert state.count() == 0
        assert _rows(bpe_train_and_tokenize(docs, n_merges=3)) == _rows(
            bpe_apply_merges(docs, [])
        )
