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
# ROTATION POLICY (round-4 verdict #6, cadence amended r10): each
# round, rotate rows that were driver-green in BOTH of the two
# preceding rounds out of the window, replacing them with registered
# queries currently outside it. Cadence (machine-checked by
# tests/test_oracle.py::test_no_full_oracle_row_skips_driver_hashing_
# beyond_cadence): a NEVER-hashed full-oracle registration must enter
# the window its own round (or be capacity-deferred at most 3); an
# active row may sit out at most 6 consecutive rounds — the original
# "~3 rounds" promise is infeasible at 149 full-oracle rows (max
# 3-round coverage through a 50-slot window at twice-green turnover
# is 100 rows); row-linked twins may retire from the window with a
# named co-covering row (RETIRED_TWINS), still oracle-verified by
# every pytest/rehearsal sweep. Constraints that bound each rotation:
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
# ROUND-13 ROTATION (full rationale in ROTATION_LEDGER.md §Round 13):
# tools/cadence_audit.py (new this round) recomputes absence from
# CORRECTNESS_r*.json last-hash rounds — the r12 ledger's "due r14"
# prose was off by one (rows rotate OUT the round AFTER their last
# hash). The audit shows 10 rows last-hashed r6 (OVERDUE) and 10 more
# last-hashed r7 (due exactly r13), so this rotation drains BOTH
# waves: OUT all 24 twice-green (r11+r12) rows, IN the 20 mandatory
# rows + kmv_pair_intersections (new full-oracle registration,
# immediate-hash rule) + 3 early drains from the r14-due r8 queue
# (bm25_search, fuzzy_part_matches, dedup_canonicalize_skew) to
# soften r14's 25-row bulge. kmv_set_cardinality may leave only
# because kmv_pair_intersections enters (same kmv_minima/kmv_est_expr
# machinery, full oracle); media_features leaves against
# media_decode_meta + media_features_check staying.
DRIVER_WINDOW: tuple[str, ...] = (
    # §2 reference surface (carried r12 INs, once-green)
    "hot_items_topn",
    "sessionize",
    "funnel_conversions",
    "channel_stats",
    "global_stats",
    "hot_sources_topn",
    "uv_bloom",
    "uv_approx_check",
    # joins family (r6-overdue IN)
    "order_ship_interval_join",
    # analytics property oracle (approx percentile rank-error bound)
    "quantity_percentiles_approx_check",
    # relational block (carried q1/q3 + r6-overdue q5/q18 + r7-due q4..q12)
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q12",
    "tpch_q18",
    # deduplication / graph family (r6-overdue + r7-due + early drain)
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_canonicalize",
    "dedup_canonicalize_skew",
    "dedup_minhash_lsh_check",
    "dedup_simhash_check",
    "dedup_incremental_check",
    # similarity / ANN family (r6-overdue rows + staying checks)
    "ann_cosine_topk",
    "embedding_quantize",
    "ann_lsh_check",
    "ann_ivf_check",
    "ann_pq_check",
    "mmr_rerank_check",
    "semantic_dedup_check",
    # text family (carried + r6-overdue repetition_stats + r7-due rows)
    "decontaminate",
    "pii_scan",
    "repetition_stats",
    "lang_id",
    "pii_redact",
    "doc_chunk",
    "heavy_hitters_check",
    # sketch family (new registration, immediate-hash rule)
    "kmv_pair_intersections",
    # joins long-tail early drain (r8, due r14)
    "fuzzy_part_matches",
    # retrieval family (carried anchors + early-drain bm25)
    "multi_query_search",
    "tfidf_top_terms",
    "bm25_search",
    # sampling / release family (carried + r6-overdue + r7-due)
    "dataset_split",
    "profile_documents",
    "stratified_cap",
    # multimodal family (r6-overdue IN + staying check)
    "media_features_check",
    "media_decode_meta",
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
