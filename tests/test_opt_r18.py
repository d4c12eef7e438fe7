"""Focused guards for the r18 optimization round's operator-internal
changes. Each optimization here must be RESULT-INVISIBLE — these tests
pin the invisibility directly at operator level (the per-query DuckDB
oracles pin it end-to-end)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_spark.operators.joins import fuzzy_match_pairs  # noqa: E402
from flink_kafka_spark.operators.sketches import count_min_sketch  # noqa: E402
from flink_kafka_spark.tables import load, spread_scan  # noqa: E402


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSpreadScan:
    """tables.spread_scan — the centralized small-scan fan-out gate."""

    def test_spreads_single_file_scan_to_parallelism(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents")
        par = spark.sparkContext.defaultParallelism
        assert spread_scan(docs).rdd.getNumPartitions() == par

    def test_noop_on_memory_backed_frame(self, spark):
        # no input files -> layout unknowable -> frame returned as-is
        df = spark.range(10)
        assert spread_scan(df) is df

    def test_row_multiset_preserved(self, spark, sf_dir):
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        assert _rows(spread_scan(docs)) == _rows(docs)


class TestBandedLevenshtein:
    """fuzzy_match_pairs' banded 3-arg kernel must be pair-for-pair and
    distance-for-distance identical to the unbounded kernel + <= filter
    it replaced (the -1 band is exactly the discarded set)."""

    @pytest.mark.parametrize("max_dist", [0, 1, 2, 3])
    def test_matches_unbounded_kernel(self, spark, max_dist):
        names = [
            (1, "alpha beta"), (2, "alpha bete"), (3, "alpha betXY"),
            (4, "alpha beta"), (5, "alphq betq"), (6, "gamma delta"),
            (7, "gamma delt"), (8, "gamma d"), (9, "alpha"),
        ]
        df = spark.createDataFrame(names, "k long, name string")
        got = _rows(fuzzy_match_pairs(df, "k", "name", max_dist=max_dist))
        # reference: same blocking, unbounded levenshtein, explicit filter
        blk = F.split(F.lower(F.col("name")), r"\s+").getItem(0)
        a = df.select(F.col("k").alias("a_key"), F.col("name").alias("a_name"), blk.alias("_b"))
        b = df.select(F.col("k").alias("b_key"), F.col("name").alias("b_name"), blk.alias("_b"))
        ref = (
            a.join(b, "_b")
            .filter(F.col("a_key") < F.col("b_key"))
            .filter(F.abs(F.length("a_name") - F.length("b_name")) <= max_dist)
            .withColumn("lev_dist", F.levenshtein("a_name", "b_name"))
            .filter(F.col("lev_dist") <= max_dist)
            .select("a_key", "b_key", "a_name", "b_name",
                    F.col("lev_dist").cast("int").alias("lev_dist"))
        )
        assert got == _rows(ref)


class TestVectorizedBpeMergeStep:
    """_bpe_merge_step's vectorized (left != right) formulation must be
    element-for-element identical to the greedy fold it replaced —
    including run pathologies, both-ends candidates and symbols that
    already contain the pair string."""

    FOLD_CASES = [
        ["a", "b"], ["a", "b", "a", "b"], ["a", "a", "b"],
        ["b", "a", "b", "a", "b"], ["a"], [], ["b", "b", "a"],
        ["ab", "a", "b"], ["a", "ab", "b"], ["a", "b", "b"],
        ["c", "a", "b", "c", "a", "b", "a"],
    ]

    @pytest.mark.parametrize("pair", [("a", "b"), ("b", "a"), ("ab", "a"), ("a", "ab"), ("c", "a")])
    def test_matches_fold(self, spark, pair):
        from flink_kafka_spark.operators.text import _bpe_merge_step

        left, right = pair
        a, b, ab = F.lit(left), F.lit(right), F.lit(left + right)
        fold = F.aggregate(
            "syms",
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.try_element_at(acc, F.lit(-1)) == a) & (x == b),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        df = spark.createDataFrame([(s,) for s in self.FOLD_CASES], "syms array<string>")
        rows = df.select(
            _bpe_merge_step("syms", left, right).alias("vec"), fold.alias("fold")
        ).collect()
        for r in rows:
            assert r["vec"] == r["fold"]

    def test_equal_pair_uses_fold_for_run_greediness(self, spark):
        # left == right falls back to the fold: aaa -> [aa, a]
        from flink_kafka_spark.operators.text import _bpe_merge_step

        df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
        assert df.select(_bpe_merge_step("syms", "a", "a").alias("m")).first()["m"] == ["aa", "a"]


class TestWeightedCms:
    """count_min_sketch(weight_col=...) over the pre-aggregated vocab
    must be cell-for-cell identical to the occurrence-stream sketch
    (the CM merge property the cms_topk_estimates rewrite relies on)."""

    def test_weighted_equals_occurrence_path(self, spark, sf_dir):
        toks = (
            load(spark, sf_dir, "documents")
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .where(F.col("tok") != "")
        )
        occ = count_min_sketch(toks, "tok", width=64, depth=3)
        vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
        weighted = count_min_sketch(vocab, "tok", width=64, depth=3, weight_col="cnt")
        assert _rows(weighted) == _rows(occ)
