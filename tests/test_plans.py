"""Physical-plan shape guards: the scale claims in PLANS.md as
assertions, so a refactor that silently adds a shuffle, degrades a
broadcast join to sort-merge, or widens a pruned scan fails pytest
instead of surviving until a bench regression.

Bounds are ceilings observed at sf0.001-0.1 (plan shapes are
SF-independent for these queries: AQE runtime re-plans don't appear in
the pre-execution explain output this audits)."""

import sys

sys.path.insert(0, ".")

from tools.gen_plans import audit  # noqa: E402

from flink_kafka_spark.queries import all_queries  # noqa: E402

# query -> (max exchanges, max sort-merge joins)
PLAN_BOUNDS = {
    # single groupBy: scan + one shuffle
    "tpch_q1": (1, 0),
    "tpch_q6": (1, 0),  # partial agg -> 1-row single-partition exchange -> final
    # dimension joins must all broadcast
    "tpch_q3": (2, 0),
    "tpch_q5": (2, 0),
    "tpch_q10": (2, 0),
    "tpch_q18": (3, 0),
    # windowed streaming analogs: one shuffle on (window, key) + topn
    "hot_items_topn": (2, 0),
    "page_views": (1, 0),
    # extensions: narrow projections must stay shuffle-free
    "text_stats": (0, 0),
    "dataset_split": (0, 0),
    "doc_chunk": (0, 0),
    "embedding_quantize": (0, 0),
    "pii_redact": (0, 0),
    # retrieval: bounded shuffles on natural keys
    "inverted_index": (2, 0),
    "bm25_search": (1, 0),
    "tfidf_top_terms": (4, 0),
    "corpus_prep": (2, 0),
    # composed: tfidf(4) + index(2) + score groupBy + topk window;
    # queries must stay broadcast (smj would mean the build side grew)
    "multi_query_search": (8, 0),
}


def test_plan_shapes(spark, sf_dir):
    qs = all_queries()
    problems = []
    for name, (max_ex, max_smj) in PLAN_BOUNDS.items():
        a = audit(qs[name].fn(spark, sf_dir))
        if a["exchanges"] > max_ex:
            problems.append(f"{name}: {a['exchanges']} exchanges > {max_ex}")
        if a["smj"] > max_smj:
            problems.append(f"{name}: {a['smj']} sort-merge joins > {max_smj}")
    assert not problems, "; ".join(problems)


def test_no_cartesian_outside_exact_ann(spark, sf_dir):
    """The only nested-loop/cartesian plan allowed in the registry is
    the labeled exact-ANN baseline (and the 1-row stats broadcasts,
    which explain() shows as BroadcastNestedLoopJoin over a single
    aggregate row)."""
    import contextlib
    import io

    qs = all_queries()
    for name in ("tpch_q5", "hot_items_topn", "dedup_minhash_lsh", "inverted_index"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name].fn(spark, sf_dir).explain("formatted")
        assert "CartesianProduct" not in buf.getvalue(), name
