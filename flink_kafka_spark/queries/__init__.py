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
# "~3 rounds" promise is infeasible at 137 full-oracle rows (max
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
# ROUND-12 ROTATION (full rationale in ROTATION_LEDGER.md §Round 12):
# OUT, all green r10+r11: the full 14-row twice-green non-check pool
# (hot_items_sql, unique_visitors, click_blacklist, login_fail_detect,
# session_windows_native, orders_cube, fk_coverage_audit,
# agg_incremental_update, events_gapfill_interp, events_key_skew,
# retention_cohorts, source_divergence, inverted_index,
# media_frame_sample). inverted_index may leave only because
# multi_query_search + tfidf_top_terms enter as the retrieval anchors;
# hot_items_sql may leave only because hot_items_topn re-enters as the
# §2-surface anchor (SQL-parity pytest pins the two to each other).
# IN, per the written r12 schedule: hot_items_topn (flagship re-hash,
# deferred from r11) plus 13 of the r7-stale long-tail — sessionize,
# funnel_conversions, channel_stats, global_stats, hot_sources_topn,
# uv_bloom, multi_query_search, tfidf_top_terms, tpch_q1, tpch_q3,
# decontaminate, pii_scan, dataset_split. The remaining r7-stale rows
# are scheduled r13 (ROTATION_LEDGER §r13 schedule).
DRIVER_WINDOW: tuple[str, ...] = (
    # §2 reference surface (streamlike / patterns / joins families)
    "hot_items_topn",
    "sessionize",
    "funnel_conversions",
    "channel_stats",
    "global_stats",
    "hot_sources_topn",
    "uv_bloom",
    "uv_approx_check",
    "page_views",
    "orders_daily_by_priority",
    "order_timeout",
    "purchase_attribution",
    # joins family
    "event_asof_order",
    # analytics property oracle (approx percentile rank-error bound)
    "quantity_percentiles_approx_check",
    # analytics (first-hashed r11, stay until twice-green)
    "quantity_percentiles",
    "customer_running_totals",
    "events_value_winsorize",
    # analytics (r8-stale, due by r14)
    "rfm_segments",
    "basket_lift",
    "changelog_roundtrip",
    "scd2_history",
    "training_mix_snapshot",
    # relational block (r8-stale due by r14, plus r7-stale q1/q3 due r13)
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q9",
    "tpch_q11",
    "tpch_q20",
    # deduplication / graph family
    "source_pagerank",
    "dedup_minhash_lsh_check",
    "dedup_simhash_check",
    "dedup_incremental_check",
    # similarity / ANN family
    "ann_lsh_check",
    "ann_ivf_check",
    "ann_pq_check",
    "mmr_rerank_check",
    "semantic_dedup_check",
    # text / sketch family (r7-stale text rows due r13 + staying checks)
    "decontaminate",
    "pii_scan",
    "quality_curriculum",
    "cms_topk_estimates",
    "kmv_set_cardinality",
    "heavy_hitters_check",
    # retrieval family (r7-stale anchors replacing inverted_index)
    "multi_query_search",
    "tfidf_top_terms",
    # sampling / release family
    "dataset_split",
    "export_shards",
    "sequence_packing",
    # multimodal family
    "media_features_check",
    "media_features",
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
