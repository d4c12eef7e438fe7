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
# ROTATION POLICY (round-4 verdict #6): each round, rotate 5-10 rows
# that were driver-green in BOTH of the two preceding rounds out of
# the window, replacing them with registered queries currently outside
# it, so every registered query earns a driver row at least once per
# ~3 rounds. Constraints that bound each rotation:
# - every ``*_check`` property oracle stays in (they are the only
#   driver verification the hash-dependent approx paths have);
# - each family keeps >=1 full-oracle row (test_driver_window_covers_
#   every_family);
# - a rotated-out query must have its semantics co-covered by a
#   staying row or a pytest (noted per row below).
#
# Round-5 rotation applied — OUT (all green in r3+r4):
#   hot_items_report      (P6 formatting twin of hot_items_topn; README
#                          golden-output parity pytest remains)
#   global_stats_fine     (salted twin; global_stats + channel_stats
#                          keep A4/W3 coverage)
#   uv_approx             (no_oracle row; its invariant twin
#                          uv_approx_check stays per the _check rule)
#   order_ship_interval_join_binned (hypothesis-tested row-identical to
#                          order_ship_interval_join, which stays)
#   high_value_purchases  (P1/P2 parse path; apache.log reference-
#                          parity pytest + staying filter rows cover it)
#   dedup_prune_stats     (1-row visibility stat; 5 dedup rows stay)
#   ann_cosine_topk_int8  (int8 twin; embedding_quantize +
#                          ann_cosine_topk stay)
#   media_frame_sample    (media_decode_meta + media_features_check
#                          keep the mapInPandas plumbing verified)
# IN: tpch_q1 tpch_q3 tpch_q5 tpch_q18 (the relational block's first
#     driver rows), pii_scan, repetition_stats, dataset_split, and the
#     new ann_pq_check (every *_check must sit in the window; tpch_q6
#     stayed out to make room — single-table filter+agg co-covered by
#     tpch_q1's plan family and full pytest/rehearsal coverage).
#
# Round-6 rotation applied — OUT (all green in r4+r5):
#   page_views            (W5/A8/F1 tumbling sum; channel_stats +
#                          global_stats keep the windowed-agg family)
#   orders_daily_by_priority (A5/W4 count-by-key; order_timeout keeps
#                          G7, staying windowed rows cover the shape)
#   event_asof_order      (as-of join; hypothesis pytest + staying
#                          interval/reconciliation join rows cover J*)
#   dedup_exact           (md5 hash-groupBy; sweep oracle stays, 4
#                          near-dup rows + canonicalize stay in)
#   dedup_clusters        (min-id CC; dedup_canonicalize IN composes
#                          the same pairs->CC pipeline plus rank)
#   text_stats            (narrow stats projection; lang_id + doc_chunk
#                          IN exercise the same text scan family)
#   corpus_prep           (composed filter chain; decontaminate +
#                          pii_scan + repetition_stats stay)
#   export_shards         (range-partition release; profile_documents
#                          + dataset_split stay for the family)
#   sequence_packing      (shard-bucketed cumsum; dataset_split +
#                          stratified_cap IN keep sampling covered)
#   mixture_resample      (deterministic resample; dataset_split +
#                          stratified_cap keep the id-hash family)
# IN: dedup_canonicalize (r5's flagship — first driver hash),
#     tpch_q4 tpch_q6 tpch_q7 tpch_q10 tpch_q12 (bench headliners
#     q4/q6/q10 and never-hashed q7/q12 per the r5 verdict schedule;
#     q8/q13-q17/q19/q21/q22/rollup follow in r7), lang_id, doc_chunk,
#     pii_redact, stratified_cap (registered-but-never-hashed text/
#     sampling rows).
#
# Round-7 rotation applied — OUT (all green in r5+r6):
#   hot_sources_topn      (F2/F3/R2; apache.log reference-parity pytest
#                          + hot_items_topn keep the topn family)
#   login_fail_detect     (T1/T2/W8; CEP strict + 3s-delay watermark
#                          pytests stay; order_timeout keeps stateful)
#   funnel_conversions    (T1/T3 composition; order_timeout + pattern
#                          pytests cover both constituent CEP shapes)
#   tpch_q1 tpch_q3 tpch_q5 tpch_q18 (r5 rotation's relational block,
#                          twice-green; staying q4-q13 rows + sweep
#                          oracles keep the scan/join/agg family)
#   decontaminate         (broadcast-shingle semi-join; sweep oracle +
#                          staying text rows cover the scan family)
#   profile_documents     (one-pass agg; sweep oracle stays)
#   dataset_split         (pure id-hash; determinism pytest + staying
#                          stratified_cap/corpus_shuffle keep sampling)
#   media_decode_meta     (green r5+r6; media_features_check keeps the
#                          mapInPandas plumbing driver-verified, and
#                          media_features enters this round)
# IN (the 7 never-driver-hashed registry rows per the r6 verdict:
#     corpus_shuffle, dedup_canonicalize_skew, ann_cosine_topk_pq,
#     text_quality, doc_fingerprint, bpe_token_count, media_features)
# plus 3 of the r02-stale relational rows (tpch_q8, tpch_q13,
#     orders_rollup; q14-q22 scheduled for r8), plus
#     dedup_incremental_check (registered this round — the *_check rule
#     requires it inside the window immediately).
#
# Round-7 late swaps (so the round's new full-oracle registrations are
# driver-hashed immediately rather than waiting for r8) — OUT, both
# green r5+r6:
#   embedding_quantize    (int8 family; ann_cosine_topk stays, the
#                          quantization round-trip bound pytest stays)
#   tfidf_top_terms       (composed and co-covered by the staying
#                          multi_query_search, which builds on tf-idf)
# IN: dedup_span_stats, dedup_span_trim (full-oracle span family rows;
#     only the rows-only dedup_incremental stays outside until r8).
#
# Round-7 second wave (same immediate-hash rule for this round's four
# new full-oracle registrations) — OUT, all green r5+r6:
#   pii_scan          (pii_redact stays — same regex family — and the
#                      incoming source_scorecard aggregates the same
#                      PII signal; sweep oracle stays)
#   repetition_stats  (text family keeps lang_id/doc_chunk/pii_redact/
#                      text_quality/doc_fingerprint/bpe_token_count)
#   dedup_ngram_jaccard (its pair pipeline is composed verbatim inside
#                      the staying dedup_canonicalize/_skew rows AND
#                      the incoming leakage_safe_split; jaccard
#                      hypothesis pytest + sweep oracle stay)
#   inverted_index    (bm25_search + multi_query_search stay and build
#                      on the same postings; sweep oracle stays)
# IN: doc_logprob, source_scorecard (text), source_overlap,
#     leakage_safe_split (dedup) — all rehearsal-verified at sf0.01
#     (the driver's exact compare) before entering the window.
#
# Round-7 third wave (same immediate-hash rule for the round's last
# three registrations; semantic_dedup_check additionally REQUIRED
# inside by the *_check rule) — OUT, all green r5+r6:
#   unique_visitors   (A6 exact distinct; uv_bloom stays with the same
#                      per-window exact counts, uv_approx_check stays,
#                      sweep oracle + streaming pytest remain)
#   dedup_embedding_cosine (embedding near-dup; the incoming
#                      semantic_dedup_check recomputes the same cosine
#                      recheck machinery with strictly stronger
#                      invariants; sweep oracle stays)
#   order_ship_interval_join (J1; interval-join hypothesis pytest +
#                      row-identical binned twin test stay, and
#                      order_line_reconciliation keeps the join family)
# IN: semantic_dedup_check (SemDeDup property oracle),
#     dedup_containment, filter_threshold_sweep — all
#     rehearsal-verified at sf0.01 before entering.
#
# Round-7 fourth wave (immediate-hash rule for the round's last four
# full-oracle registrations; heavy_hitters_check additionally REQUIRED
# inside by the *_check rule) — OUT, all green r5+r6:
#   channel_stats     (A3/G5/W3 windowed count; global_stats keeps the
#                      windowed-agg family, reference-parity pytest +
#                      sweep oracle stay)
#   sessionize        (gap sessionization; retention_cohorts'
#                      user-window shape + the incoming
#                      event_transitions cover the per-user ordered
#                      window; sweep oracle + pytest stay)
#   uv_bloom          (stateful BF distinct; uv_approx_check stays —
#                      the same per-window exact counts are its
#                      invariant input — plus streaming eviction pytest)
#   multi_query_search (bm25_search stays for the retrieval family and
#                      shares the postings/index machinery)
# IN: heavy_hitters_check (Misra-Gries sketch property oracle),
#     event_transitions, traffic_anomalies, word_pmi — all
#     rehearsal-verified at sf0.01 before entering.
#
# Round-7 fifth wave — OUT, green r5+r6:
#   ann_cosine_topk   (exact brute-force; ann_lsh/ivf/pq checks stay
#                      full-oracle in window, the sweep oracle stays,
#                      and the incoming mmr_rerank_check re-runs the
#                      same brute-force builder as its candidate stage)
# IN: mmr_rerank_check (MMR greedy equivalence + invariants — the
#     *_check rule requires it inside immediately).
#
# Round-7 sixth wave — OUT, both green r5+r6:
#   click_blacklist   (T5/F7/G6/W12; the blacklist_stream streaming
#                      pytest + order_timeout keep the stateful family)
#   order_line_reconciliation (J2; tx_match streaming pytest + the
#                      interval-join row-identity tests keep the join
#                      family hashed via staying rows)
# IN: weighted_sample (A-Res per-stratum draw), snapshot_diff
#     (release-diff verdicts) — both rehearsal-verified at sf0.01.
#
# Round-7 seventh wave (immediate-hash rule for three of the round's
# five newest full-oracle registrations; doc_bigram_logprob and
# vocab_oov_rate hold sweep-oracle coverage outside until r8 — the
# only remaining twice-green rotation candidates after them were
# hot_items_topn, the flagship, and bm25_search, the retrieval
# family's sole in-window row) — OUT, all green r5+r6:
#   hot_items_sql     (§2.11 SQL surface; hot_items_topn stays with
#                      identical semantics/oracle and the SQL-path
#                      parity pytest remains)
#   global_stats      (A4/G4/G8 global windowed agg; hot_items_topn
#                      keeps the windowed family, sweep oracle stays)
#   order_timeout     (T3/T4/G7; the order-timeout streaming replay
#                      pytest + patterns CEP pytests keep the state
#                      machines exercised; returns in the r8 window)
# IN: clf_quality_score (hashed-linear model gate), fuzzy_part_matches
#     (blocked record linkage), value_drift_psi (PSI drift) — all
#     rehearsal-verified at sf0.01 before entering.
#
# r8 ROTATION SCHEDULE (written r7 so the next round starts from a
# plan, not archaeology). Never-driver-hashed full-oracle rows, all
# sweep-green and sf0.01-rehearsed this round: doc_bigram_logprob,
# vocab_oov_rate, doc_embedding_hash, doc_semantic_pairs,
# filter_audit, encoding_audit, k_anonymity_audit, markup_strip,
# changelog_roundtrip, scd2_history, purchase_attribution,
# rfm_segments, basket_lift, orders_status_pivot, and the round's
# flagship compose training_mix_snapshot (window priority: the
# compose first — its hash pins four stages' interactions; then the
# closure property changelog_roundtrip). Overdue relational rows (hashed r06
# or earlier, due under once-per-~3-rounds): tpch_q14-q17, q19, q21,
# q22. Natural r8 outs (would be twice-green r6+r7): the five tpch
# rows rotated in r6 (q4/q6/q7/q10/q12), lang_id, doc_chunk,
# pii_redact, stratified_cap, dedup_canonicalize — with order_timeout
# returning per the seventh-wave note. Keep every *_check in, keep
# >=1 full-oracle row per family (test_driver_window_covers_every_
# family enumerates membership).
DRIVER_WINDOW: tuple[str, ...] = (
    # §2 reference surface (streamlike / patterns / joins families)
    "hot_items_topn",
    "uv_approx_check",
    # analytics property oracle (approx percentile rank-error bound)
    "quantity_percentiles_approx_check",
    # analytics additions (r7 fourth + seventh waves)
    "event_transitions",
    "traffic_anomalies",
    "value_drift_psi",
    # joins family (r7 seventh wave)
    "fuzzy_part_matches",
    # relational block (q4/q6/q7/q10/q12 rotated in r6;
    # q8/q13/orders_rollup rotated in r7 — r02-stale rows)
    "tpch_q4",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "orders_rollup",
    # deduplication family
    "dedup_minhash_lsh_check",
    "dedup_simhash_check",
    "dedup_canonicalize",
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
    "ann_cosine_topk_pq",
    "semantic_dedup_check",
    # text analysis family
    "lang_id",
    "doc_chunk",
    "pii_redact",
    "text_quality",
    "filter_threshold_sweep",
    "doc_fingerprint",
    "bpe_token_count",
    "doc_logprob",
    "clf_quality_score",
    "source_scorecard",
    "word_pmi",
    "heavy_hitters_check",
    # retrieval family
    "bm25_search",
    # sampling / release family
    "stratified_cap",
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
