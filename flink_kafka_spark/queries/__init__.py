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
# ROUND-16 ROTATION (full rationale in ROTATION_LEDGER.md §Round 16):
# the OUT pool is structurally tiny — the 50-row r15 window was almost
# entirely first-hash rows, so only 9 rows are twice-green (r14+r15)
# and 8 of them are pinned checks. Two slots were produced:
# (1) bm25_search (twice-green, the lone eligible OUT) leaves and
# multi_query_search enters in its place, keeping the retrieval
# family's full-oracle anchor in-window while refreshing a row last
# hashed r14; (2) dedup_canonicalize_skew retires to RETIRED_TWINS —
# it is the skew-hinted row-identity twin of dedup_canonicalize
# (tests/test_properties.py::test_canonicalize_skew_safe_path_is_row_
# identical pins both paths identical every session) with 4 green
# driver hashes (r7/r8/r13/r15) — freeing the slot for
# media_phash_incremental, the registry's only never-hashed row
# (r15 capacity deferral), which empties the never-hashed queue.
# The 20 r10-stale rows whose 6-round cadence bound lands on r16
# cannot fit a 2-slot wave; per the written r16 schedule they take a
# CADENCE_DEBT deadline of r17 (tests/test_oracle.py), where the OUT
# pool is ~34 rows (the r15 INs plus the carried first-hash rows, all
# twice-green by then).
#
# CAPACITY POLICY AMENDMENT (r15 verdict item 7, adopted r16): the
# 6-round cadence supports at most 175 full-oracle rows through a
# 50-slot window (50 + 5*25). At 154 rows the headroom is 21, and
# new families arrive ~5-8 rows/round. Rules, effective r16:
# (a) REGISTRATION PACING — a round may register at most 3 new
#     full-oracle rows (the immediate-hash rule caps this anyway:
#     each IN needs an OUT slot, and deferrals max out at 3 rounds);
# (b) TWIN-FIRST — a new row that is a parameterized/hinted/skew twin
#     of an existing row MUST ship with the row-identity pytest that
#     qualifies it for RETIRED_TWINS, and retires after its FIRST
#     green driver hash (precedents: global_stats_fine,
#     order_ship_interval_join_binned, dedup_canonicalize_skew);
# (c) CEILING TRIPWIRE — when the full-oracle count reaches 170,
#     registration freezes until retirements bring it back under;
#     a pytest asserts the count stays <= 170
#     (tests/test_oracle.py::test_full_oracle_count_under_ceiling).
DRIVER_WINDOW: tuple[str, ...] = (
    # §2 reference surface / joins / analytics checks (pinned)
    "uv_approx_check",
    "quantity_percentiles_approx_check",
    # relational block (q8/q13 carried for their first hash since r8)
    "tpch_q8",
    "tpch_q13",
    # analytics long-tail (CADENCE_DEBT r15 + r16 pull-forward)
    "orders_rollup",
    "traffic_anomalies",
    "event_transitions",
    "value_drift_psi",
    "events_dedup_late",
    # deduplication family (carried first-hash rows + checks + r16
    # pull-forward anchor; canonicalize_skew retired r16 -> slot for
    # the never-hashed media row at the bottom of the window)
    "dedup_exact",
    "dedup_containment",
    "dedup_span_stats",
    "dedup_span_trim",
    "dedup_minhash_lsh_check",
    "dedup_simhash_check",
    "dedup_incremental_check",
    # similarity / ANN family (checks)
    "ann_lsh_check",
    "ann_ivf_check",
    "ann_pq_check",
    "mmr_rerank_check",
    "semantic_dedup_check",
    "embedding_drift",
    # text family (carried first-hash rows + CADENCE_DEBT r15)
    "text_quality",
    "doc_fingerprint",
    "word_pmi",
    "source_scorecard",
    "bpe_token_count",
    "clf_quality_score",
    "doc_logprob",
    "filter_threshold_sweep",
    "heavy_hitters_check",
    "kmv_pair_intersections",
    # joins long-tail (once-green r13 IN stays)
    "fuzzy_part_matches",
    # retrieval family anchor (bm25_search rotated out r16 after 9
    # green hashes; multi_query_search keeps the family's full-oracle
    # row in-window and refreshes its own r14-stale cadence)
    "multi_query_search",
    # source analytics (carried first-hash row)
    "source_overlap",
    # sampling / release / privacy family (carried first-hash rows +
    # the never-hashed r13/r14 deferrals)
    "weighted_sample",
    "snapshot_diff",
    "corpus_shuffle",
    "leakage_safe_split",
    "mixture_resample",
    "dq_expectations",
    "l_diversity_audit",
    "t_closeness_audit",
    "release_gate_snapshot",
    "seasonal_anomalies",
    "zorder_layout",
    # multimodal family (check anchor + the r15 registrations on the
    # immediate-hash rule: full-value-oracle perceptual hash + media
    # near-dup pairs; media_phash_incremental = the r15 capacity
    # deferral, first hash r16 — never-hashed queue now empty)
    "media_features_check",
    "media_phash",
    "media_phash_dedup",
    "media_phash_incremental",
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
