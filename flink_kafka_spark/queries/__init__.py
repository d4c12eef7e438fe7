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
# ROUND-8 ROTATION (full rationale in ROTATION_LEDGER.md §Round 8):
# OUT, all green r6+r7: tpch_q4 q6 q7 q10 q12, lang_id, doc_chunk,
# pii_redact, stratified_cap, dedup_canonicalize; plus the no_oracle
# retirement ann_cosine_topk_pq (r7 verdict item 4 — ann_pq_check
# carries its invariant). IN: training_mix_snapshot (compose flagship),
# changelog_roundtrip, scd2_history, purchase_attribution,
# rfm_segments, basket_lift, order_timeout (returning), and the new
# registrations tpch_q2 q9 q11 q20 (immediate-hash rule).
DRIVER_WINDOW: tuple[str, ...] = (
    # §2 reference surface (streamlike / patterns / joins families)
    "hot_items_topn",
    "uv_approx_check",
    "order_timeout",
    # analytics property oracle (approx percentile rank-error bound)
    "quantity_percentiles_approx_check",
    # analytics (r7 waves + r8 never-hashed rows)
    "event_transitions",
    "traffic_anomalies",
    "value_drift_psi",
    "purchase_attribution",
    "rfm_segments",
    "basket_lift",
    "changelog_roundtrip",
    "scd2_history",
    # joins family (r7 seventh wave)
    "fuzzy_part_matches",
    # relational block (q8/q13/rollup first-hashed r7; q2/q9/q11/q20
    # registered this round — immediate-hash rule)
    "tpch_q2",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q13",
    "tpch_q20",
    "orders_rollup",
    # deduplication family
    "dedup_minhash_lsh_check",
    "dedup_simhash_check",
    "dedup_canonicalize_skew",
    "dedup_containment",
    "dedup_span_stats",
    "dedup_span_trim",
    "dedup_incremental_check",
    "source_overlap",
    "leakage_safe_split",
    # similarity / ANN family
    "ann_lsh_check",
    "ann_ivf_check",
    "ann_pq_check",
    "mmr_rerank_check",
    "semantic_dedup_check",
    # text analysis family
    "text_quality",
    "filter_threshold_sweep",
    "doc_fingerprint",
    "bpe_token_count",
    "doc_logprob",
    "clf_quality_score",
    "source_scorecard",
    "word_pmi",
    "heavy_hitters_check",
    # compose flagship (training-mix manifest — four stages' hash pin)
    "training_mix_snapshot",
    # retrieval family
    "bm25_search",
    # sampling / release family
    "corpus_shuffle",
    "weighted_sample",
    "snapshot_diff",
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
