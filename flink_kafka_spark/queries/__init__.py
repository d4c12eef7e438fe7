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
# ROUND-14 ROTATION (full rationale in ROTATION_LEDGER.md §Round 14):
# tools/cadence_audit.py at round entry shows 22 r8-stale rows at
# their hard 6-absence bound (due exactly r14). OUT pool = the 14
# carried r12-INs, all twice-green (r12+r13); the 24 r13-INs are
# once-green and may not leave. 14 < 22, so all 14 slots go to the
# scheduled family-balanced IN set and the remaining 8 r8-stale rows
# enter CADENCE_DEBT (tests/test_oracle.py) with written deadline r15
# — the designed late-but-never-forgotten mechanism. The §2
# streamlike surface leaves the window whole (hot_items_topn,
# channel_stats, global_stats, hot_sources_topn, uv_bloom, sessionize,
# funnel_conversions): every row is co-covered by its SQL-twin /
# parity pytests and the full rehearsal sweep, and the family has no
# never-hashed backlog (re-enters from the r13-IN pool at r15+).
DRIVER_WINDOW: tuple[str, ...] = (
    # §2 reference surface / joins / analytics checks (r13 INs stay)
    "order_ship_interval_join",
    "uv_approx_check",
    "quantity_percentiles_approx_check",
    # relational block (q4..q18 carried; q8/q13 at their r14 bound IN)
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q18",
    # deduplication family (carried r13 INs + the r8-stale trio IN)
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_canonicalize",
    "dedup_canonicalize_skew",
    "dedup_containment",
    "dedup_span_stats",
    "dedup_span_trim",
    "dedup_minhash_lsh_check",
    "dedup_simhash_check",
    "dedup_incremental_check",
    # similarity / ANN family (carried rows + staying checks)
    "ann_cosine_topk",
    "embedding_quantize",
    "ann_lsh_check",
    "ann_ivf_check",
    "ann_pq_check",
    "mmr_rerank_check",
    "semantic_dedup_check",
    # text family (carried + r8-stale rows at their bound IN)
    "repetition_stats",
    "lang_id",
    "pii_redact",
    "doc_chunk",
    "text_quality",
    "doc_fingerprint",
    "word_pmi",
    "source_scorecard",
    "heavy_hitters_check",
    "kmv_pair_intersections",
    # joins long-tail (carried r13 IN)
    "fuzzy_part_matches",
    # retrieval family anchor (carried r13 IN)
    "bm25_search",
    # source analytics (r8-stale IN)
    "source_overlap",
    # sampling / release family (carried + r8-stale rows IN)
    "profile_documents",
    "stratified_cap",
    "weighted_sample",
    "snapshot_diff",
    "corpus_shuffle",
    "leakage_safe_split",
    # multimodal family (carried)
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
