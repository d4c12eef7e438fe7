"""Named-query registry: the engine's public correctness surface.

Each :class:`Query` pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with (where SQL-expressible) an ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. The driver's harness compares
both at sf=0.01 (row-count + schema + order-insensitive value hash), so
column names/aliases MUST match between the two sides.

Conventions that keep the comparison stable:
- window bounds, event times → epoch-second **longs**, never raw
  timestamps (timezone/precision-proof);
- every computed column explicitly aliased identically on both sides;
- floating-point outputs rounded (4-6 dp) on both sides;
- deterministic tie-breaks on every rank.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One registered query/operator exposed to the driver harness."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    survey: str = ""  # SURVEY.md §2 operator ids this covers
    tags: tuple[str, ...] = field(default_factory=tuple)


# The driver's correctness harness hashes exactly the FIRST 50 entries
# of ``queries()`` in registry order, so the window below is curated so
# every component family — reference §2 surface, dedup, similarity,
# retrieval, sampling/release, multimodal, relational — has at least
# one full-oracle row inside it, and every ``*_check`` property oracle
# for the approx paths is included (round-2 verdict item 1). Queries
# past the window keep full pytest + rehearsal coverage at every scale
# factor; they are rotation candidates, not unverified code.
#
# ROTATION POLICY (round-4 verdict #6): each round, rotate rows that
# were driver-green in BOTH of the two preceding rounds out of the
# window, replacing them with registered queries currently outside it,
# so every registered query earns a driver row at least once per ~3
# rounds. Constraints that bound each rotation:
# - every ``*_check`` property oracle stays in (they are the only
#   driver verification the hash-dependent approx paths have);
# - each family keeps >=1 full-oracle row (test_driver_window_covers_
#   every_family);
# - a rotated-out query must have its semantics co-covered by a
#   staying row or a pytest;
# - new full-oracle registrations enter the window the same round
#   ("immediate-hash rule"), after sf0.01 rehearsal.
#
# The per-wave history — every OUT with its co-coverage note, every IN,
# and the never-hashed queue — lives in ROTATION_LEDGER.md (round-7
# verdict item 8: the ledger was outgrowing this header).
#
# ROUND-9 ROTATION (full rationale in ROTATION_LEDGER.md §Round 9):
# OUT, all green r7+r8: the 25 twice-green non-check rows (analytics
# r7 wave, tpch q8/q13/rollup, the dedup/text/sampling r7 blocks,
# fuzzy_part_matches, bm25_search). IN: the 10-row never-hashed queue
# (doc_bigram_logprob ... orders_status_unpivot), the overdue
# relational rows tpch_q14-q17/q19/q21/q22, family anchors
# dedup_exact / order_line_reconciliation / inverted_index /
# mixture_resample, and this round's new registrations
# (immediate-hash rule).
DRIVER_WINDOW: tuple[str, ...] = (
    # §2 reference surface (streamlike / patterns / joins families)
    "hot_items_topn",
    "uv_approx_check",
    "order_timeout",
    "order_line_reconciliation",
    # analytics property oracle (approx percentile rank-error bound)
    "quantity_percentiles_approx_check",
    # analytics (first-hashed r8, stay until twice-green)
    "purchase_attribution",
    "rfm_segments",
    "basket_lift",
    "changelog_roundtrip",
    "scd2_history",
    # analytics (never-hashed queue + new registrations)
    "k_anonymity_audit",
    "orders_status_pivot",
    "orders_status_unpivot",
    "events_gapfill",
    "orders_moving_revenue",
    "events_dedup_late",
    # relational block (q2/q9/q11/q20 first-hashed r8; q14-q22 overdue)
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # deduplication family
    "dedup_exact",
    "dedup_minhash_lsh_check",
    "dedup_simhash_check",
    "dedup_incremental_check",
    # similarity / ANN family
    "ann_lsh_check",
    "ann_ivf_check",
    "ann_pq_check",
    "mmr_rerank_check",
    "semantic_dedup_check",
    # text analysis family (never-hashed queue + new registration)
    "doc_bigram_logprob",
    "vocab_oov_rate",
    "doc_embedding_hash",
    "doc_semantic_pairs",
    "filter_audit",
    "encoding_audit",
    "markup_strip",
    "bpe_merge_candidates",
    "heavy_hitters_check",
    # compose flagship (training-mix manifest — four stages' hash pin)
    "training_mix_snapshot",
    # retrieval family
    "inverted_index",
    # sampling / release family
    "mixture_resample",
    # multimodal family
    "media_features",
    "media_features_check",
)


def all_queries() -> dict[str, Query]:
    """Collect every registered query, keyed by name.

    Order: :data:`DRIVER_WINDOW` first (the driver-verified set), then
    every remaining query in module registration order.
    """
    from . import (
        analytics,
        dedup,
        joins,
        multimodal,
        patterns,
        similarity,
        streamlike,
        textops,
        tpch,
    )

    collected: dict[str, Query] = {}
    for mod in (streamlike, patterns, joins, tpch, analytics, dedup, similarity, textops, multimodal):
        for q in mod.QUERIES:
            if q.name in collected:
                raise ValueError(f"duplicate query name {q.name}")
            collected[q.name] = q

    missing = [n for n in DRIVER_WINDOW if n not in collected]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not registered: {missing}")
    out = {n: _released(collected[n]) for n in DRIVER_WINDOW}
    out.update((n, _released(q)) for n, q in collected.items() if n not in out)
    return out


def _released(q: Query) -> Query:
    """Wrap a query so invoking it first releases the PREVIOUS query's
    operator-internal persists (see flink_kafka_spark.caching): in a
    sequential sweep — the driver's 50-query correctness pass, pytest,
    bench — the prior result has been materialized by the time the next
    query is built, so its cached subtrees are dead weight in the block
    store. Releasing at the next-query boundary keeps at most one
    query's working set cached."""
    import functools

    from ..caching import release_all

    @functools.wraps(q.fn)
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_all()
        return q.fn(spark, sf_dir)

    return Query(q.name, fn, q.oracle, q.survey, q.tags)
