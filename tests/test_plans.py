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
#
# Every DRIVER_WINDOW query (plus the bench-only dedup_minhash_lsh) is
# pinned at the ceiling observed at sf0.001-0.1 — round-4's lesson: the
# MinHash rework changed plan shape and the only detector was the bench
# number after the fact. SMJ ceilings > 0 are deliberate and commented;
# everywhere else a sort-merge join means a broadcast degraded.
PLAN_BOUNDS = {
    # r18 NOTE on "+spread" annotations below: tables.spread_scan (the
    # guide-§2.5 unsplittable-input remedy, centralized from the r7
    # _lsh_bands gate) adds ONE round-robin exchange per corpus
    # tokenize/fingerprint pass when — and only when — the input
    # arrives in fewer file splits than cores, which is always true of
    # the single-file test fixtures this audit runs on and never true
    # of a many-file 100 TB corpus. Each affected pin below rises by
    # exactly its number of spread-gated passes; the underlying
    # shuffle structure is unchanged.
    # single groupBy: scan + one shuffle
    "tpch_q1": (1, 0),
    "tpch_q6": (1, 0),  # partial agg -> 1-row single-partition exchange -> final
    # dimension joins must all broadcast
    "tpch_q2": (3, 0),  # derived-ps agg + persisted eligible reused by the min-cost branch
    "tpch_q3": (2, 0),
    "tpch_q4": (1, 0),  # semi-join broadcasts, one agg shuffle
    "tpch_q5": (2, 0),
    "tpch_q7": (1, 0),  # all 5 dims broadcast onto the lineitem scan
    "tpch_q8": (1, 0),
    "tpch_q9": (2, 0),  # derived-ps agg + orderkey join; every dim broadcast
    "tpch_q10": (2, 0),
    "tpch_q11": (5, 0),  # ps agg + per-part agg (persisted) + 1-row total broadcast
    "tpch_q20": (3, 0),  # pair agg + distinct suppkeys + ordered output
    "tpch_q12": (1, 0),  # orders broadcast-joins the pushed lineitem scan
    "tpch_q13": (2, 0),  # right-outer count + distribution agg
    "tpch_q14": (1, 0),
    "tpch_q15": (3, 0),  # revenue view reused across max-subquery + join
    "tpch_q16": (2, 0),
    "tpch_q17": (2, 0),  # per-part avg subquery + main scan
    "tpch_q18": (3, 0),
    "tpch_q19": (1, 0),
    "tpch_q21": (3, 0),  # exists/not-exists as semi/anti over lineitem
    "tpch_q22": (2, 0),
    "orders_rollup": (1, 0),
    "orders_cube": (1, 0),  # one Expand + one agg exchange, like rollup
    # 4 FK edges x (distinct-key agg + 1-row audit agg); parents broadcast
    "fk_coverage_audit": (8, 0),
    # built-in session_window: one user_id shuffle + in-partition merge
    "session_windows_native": (1, 0),
    # incremental view maintenance: the fingerprint full-outer diff is
    # SMJ-bound like media_features_check (both sides corpus-sized);
    # the edit-sized probe joins AQE-broadcast at runtime. The static
    # count includes the persisted changelog's lineage shown inline.
    # (+2 exchanges r10: the advisory fix distincts the edit-sized
    # changed-id set before the minus join; +1 late-r10: the plus side
    # resolves the changelog to one winning op per id through an
    # edit-sized window — multi-op changelogs apply one final state)
    "agg_incremental_update": (10, 6),
    "customer_running_totals": (1, 0),  # per-key window, one shuffle
    # grid resample: obs agg (persisted, single scan) + distinct keys
    # + per-key ffill window; bounds ride a 1-row broadcast
    "events_gapfill": (3, 0),
    # same machinery; the backward+forward frames share one sort
    "events_gapfill_interp": (3, 0),
    # daily partial agg + priority RANGE-frame window over the day frame
    "orders_moving_revenue": (2, 0),
    # packed-min first-arrival dedup: one groupBy, map-side combined
    "events_dedup_late": (1, 0),
    # key-count shuffle + 1-row stats agg over the counts frame
    "events_key_skew": (2, 0),
    # vocab count + pair count; top-k is TakeOrderedAndProject
    "bpe_merge_candidates": (2, 0),
    # iterative trainer: the returned merge table is a LocalRelation —
    # the per-round work (vocab-frame pair count + 1-row argmax) runs
    # while the plan is BUILT, like dedup_canonicalize's CC loop
    "bpe_train_merges": (0, 0),
    # apply half: trainer runs while the plan is built (merge table is
    # a driver constant); the fold runs on the distinct-vocab frame
    # (one w-shuffle), broadcast-joins n_toks back to the unshuffled
    # occurrence stream, then the per-doc groupBy
    "bpe_tokenize_stats": (2, 0),  # +spread x1 (apply words pass); r19: the
    # tokenizer reuses the trainer's final vocab state, so the apply-side
    # distinct-vocab exchange and its spread are gone from the plan
    # corpus histogram shuffle + single-partition window over the
    # <=10001-row score frame (the no-global-sort quantile design)
    "quality_curriculum": (2, 0),
    # token fan-out -> one <=d*w-key shuffle; top-20 exact baseline +
    # broadcast sketch probe
    "cms_topk_estimates": (3, 0),
    # corpus shuffles: ev distinct + exact self-join baseline; the
    # other exchanges are on <= k x |types| sketch frames, every join
    # a broadcast. r19 one-pass kmv_minima: the HLL-threshold sizing
    # pass (its groupBy + the distinct-vs-window re-exchange) is gone —
    # one mapInPandas partial-top-k + one k-bounded groupBy remain
    "kmv_set_cardinality": (13, 0),
    # sketch-only pair algebra: ONE corpus pass (r19 one-pass
    # kmv_minima — partial-top-k mapInPandas inside the scan stage,
    # then a single k-bounded groupBy whose (s) partitioning the pair
    # rollup REUSES); everything after runs on the |sets|-row
    # sorted-hash-ARRAY frame via array set-ops inside the broadcast
    # pair projection. 2 = spread + the minima groupBy — the second
    # shingle pass, the HLL sizing agg and its spread are gone
    "kmv_pair_intersections": (2, 0),  # +spread x1 (single shingle pass)
    # (set, sub) HLL cell shuffle + sketch-bytes rollup shuffle
    "uv_hll_rollup": (2, 0),
    # (set, sub) KLL cell shuffle + sketch-bytes merge shuffle — the
    # hll_rollup twin; value stream crosses the wire once
    "kll_quantile_rollup": (2, 0),
    # ONE scan computes every declared metric; the 2 exchanges are the
    # exact-distinct two-phase behind the uniqueness check (the stack
    # pivot runs on the 1-row aggregate, adding zero passes)
    "dq_expectations": (2, 0),
    # posexplode scan -> (label, dim) sum shuffle; the corpus centroid
    # re-aggregates the SAME frame (AQE ReusedExchange at runtime —
    # pinned by test_centroid_drift_scan_reuse) and broadcasts 1 row
    "embedding_drift": (6, 0),
    # one quasi-key shuffle carries all three windows (class count,
    # dense_rank, max-rank) — the k_anonymity shape plus diversity
    "l_diversity_audit": (1, 0),
    # one corpus cell shuffle (map-side combined), then sketch-sized
    # frames only: class agg + value agg + the 1-row global histogram's
    # single-partition fold; the per-class cum window reuses the class
    # agg's (quasi) partitioning — no fifth exchange
    "t_closeness_audit": (4, 0),
    # 1-row bounds agg (2 exch: partial->single) broadcast onto the
    # scan + the bucket agg; zkey is a pure codegen expression
    "zorder_layout": (3, 0),
    # one scan: md5 groupBy (corpus shuffle) -> (class, band) cell agg
    # (persisted; replaces the old count_distinct expand) -> class agg
    # + the weighted t-closeness machinery's four sketch-sized
    # exchanges (operator cell re-agg, class_size, value histogram,
    # 1-row global fold; the per-class cum window and the keep join
    # reuse existing partitioning/broadcasts) -> 1-row funnel agg.
    # r18 LEAK-GATE stage: ONE persisted fingerprint pass over the
    # corpus serves both decontamination sides (the eval split is a
    # subset of the same corpus — winnow_decontaminate's defining
    # equality join minus its evidence rollups), and the group gate
    # tests the REPRESENTATIVE id against the broadcast leak-sized
    # contam set, so the funnel reads documents exactly TWICE (canon
    # + fingerprints). Static counts still multiply the persisted
    # cells subtree across its 3 consumers pre-materialization; the
    # LIVE post-AQE plan is 5 exchanges / 0 SMJ / 2 broadcasts
    "release_gate_snapshot": (11, 0),  # +spread (winnow fingerprint pass)
    # one corpus shuffle (map-side-combined cell count) + the seasonal
    # window's regroup on the tiny cells frame
    "seasonal_anomalies": (2, 0),
    # percentile agg + broadcast bounds join + final per-type agg
    "events_value_winsorize": (2, 0),
    # iterative driver loop (CC-style eager checkpoints): the returned
    # frame is the final round's checkpoint scan; the per-round work
    # (overlap-matrix edges once, then node-sized rank joins) runs
    # while the plan is BUILT
    "source_pagerank": (0, 0),
    "quantity_percentiles": (1, 0),
    "quantity_percentiles_approx": (1, 0),
    # windowed streaming analogs: one shuffle on (window, key) + topn
    "hot_items_topn": (2, 0),
    "hot_items_report": (2, 0),
    "hot_items_sql": (2, 0),
    "page_views": (1, 0),
    "unique_visitors": (2, 0),  # (window) shuffle + distinct
    "uv_approx": (1, 0),
    # distinct (window,user) pre-shuffle (map-side combined) bounds the
    # serial per-window bloom insert at O(UV), + the window regroup
    "uv_bloom": (2, 0),
    "channel_stats": (1, 0),
    "global_stats": (1, 0),
    "global_stats_fine": (2, 0),  # fine-slide rollup: slice agg + window agg
    "orders_daily_by_priority": (1, 0),
    "hot_sources_topn": (2, 0),
    "high_value_purchases": (0, 0),  # pure filter+project, no shuffle
    "login_fail_detect": (1, 0),
    "order_timeout": (1, 0),
    "click_blacklist": (1, 0),
    "sessionize": (1, 0),
    "funnel_conversions": (1, 0),  # step frames broadcast, one final agg
    "order_ship_interval_join": (0, 0),  # broadcast interval join
    "order_ship_interval_join_binned": (0, 0),
    # full-outer reconciliation: SMJ IS the intended plan (both sides
    # same size, no broadcastable build) — 2 exchanges co-partition it
    "order_line_reconciliation": (2, 2),
    "event_asof_order": (1, 0),
    "quantity_percentiles_approx_check": (3, 0),
    # cohort matrix: (user,week) distinct + user window + cohort count
    # + the tiny counts-frame window for the retained denominator
    "retention_cohorts": (4, 0),
    # per-source KL: one (source,token) count shuffle (persisted once,
    # feeding three broadcast-side branches) + final |sources| rollup;
    # the corpus-dist/total joins must stay broadcast
    "source_divergence": (6, 0),
    # Markov transitions: user-key lag window + pair count + the tiny
    # per-prev denominator window
    "event_transitions": (3, 0),
    # (key,hour) count + per-key stats window over the hourly frame
    "traffic_anomalies": (2, 0),
    # k-anonymity: one quasi-key window, count-only (skew-harmless)
    "k_anonymity_audit": (1, 0),
    # SCD2: lag + running-sum + run rollup + lead, ALL on the user key
    # — one shuffle carries four window passes
    "scd2_history": (1, 0),
    # last-touch attribution: conditional last_value IGNORE NULLS,
    # one user-key shuffle (the as-of join collapsed into a window)
    "purchase_attribution": (1, 0),
    # RFM: custkey agg + 1-row percentile cuts broadcast back (the agg
    # exchange appears twice pre-AQE; ReuseExchange collapses) — no
    # global ntile sort anywhere
    "rfm_segments": (3, 0),
    # basket lift: order-key self-join (fan-out bounded by items per
    # order) + pair/item counts; the distinct-baskets exchange feeds
    # three branches pre-AQE, item/total joins broadcast
    "basket_lift": (9, 0),
    # pivot with explicit domain: single conditional-agg shuffle (+1
    # pre-AQE partial split); an inferred domain would add a distinct
    # job and a data-dependent schema
    "orders_status_pivot": (2, 0),
    # unpivot closure: the pivot's shuffle + a narrow Expand melt
    "orders_status_unpivot": (2, 0),
    # MG sketch: k x P partials shuffle + single-partition compress
    # window; exactly ONE corpus scan (summed partials persisted)
    "heavy_hitters": (2, 0),
    # sketch + exact-count baseline + bound joins (check scale only);
    # everything joinable must broadcast
    "heavy_hitters_check": (9, 0),
    # pair-count shuffle + vocab-bounded broadcast joins + global rank
    # window over the pair frame. r19: the doc-frequency frame is
    # persisted, so its explode + groupBy subtree appears once instead
    # of once per broadcast rename (5 -> 4; one corpus token pass
    # instead of two at any scale)
    "word_pmi": (4, 0),  # +spread (distinct-word array pass)
    # extensions: narrow projections must stay shuffle-free
    "text_stats": (0, 0),
    "dataset_split": (0, 0),
    "doc_chunk": (0, 0),
    "embedding_quantize": (0, 0),
    "pii_redact": (0, 0),
    "pii_scan": (0, 0),
    "repetition_stats": (0, 0),
    "lang_id": (0, 0),
    "text_quality": (0, 0),
    # pass-rate curve: histogram shuffle (≤ steps+1 groups, map-side
    # combined) + the SinglePartition window over the 11-row grid
    "filter_threshold_sweep": (2, 0),
    "bpe_token_count": (0, 0),
    "doc_fingerprint": (0, 0),
    "media_features": (0, 0),
    "stratified_cap": (1, 0),  # one shuffle on the stratum key
    # retrieval: bounded shuffles on natural keys
    "inverted_index": (2, 0),  # narrow postings: per-row array_distinct; +spread
    "bm25_search": (3, 0),  # +spread x2 (both narrow passes inline the gated scan pre-AQE)
    # r18 stride interleave: per-source rn shuffle + export_shards'
    # two-pass range machinery (range repartition + the pinned
    # partitioning read twice pre-materialization); offsets broadcast
    "source_interleave": (5, 0),
    # r18 hybrid fusion: the two rankers' exchanges (BM25 stats fold +
    # top-k, dense per-query rank regroup) + ONE candidate-sized
    # fusion groupBy — the fused frames never exceed 2 x RRF_DEPTH
    # rows, so fusion adds no corpus-scale shuffle
    "hybrid_rrf_search": (5, 0),  # +spread x2 (bm25 passes; cosine side unchanged)
    "tfidf_top_terms": (4, 0),
    "corpus_prep": (2, 0),
    # audit twin: the dedup groupBy becomes a content-hash window —
    # one shuffle, every rule a JVM expression over the same scan
    "filter_audit": (1, 0),
    # the full assembly compose: dup window + (id, shingle) shuffles +
    # survivor-manifest persist feeding the mixture totals; benchmark
    # shingles and per-source thresholds must stay broadcast — three
    # narrow corpus scans total (gates, shingle branch, bench branch)
    "training_mix_snapshot": (9, 0),  # +spread x2 (decontaminate shingle passes)
    "encoding_audit": (0, 0),  # pure regexp projection
    "markup_strip": (0, 0),  # chained-regexp projection
    # composed: query construction (r12 doc_filter pushdown inside
    # tfidf_top_terms: 5-doc tf groupBy + cand-terms distinct +
    # candidate-pruned array_distinct df groupBy + per-doc rank
    # window = 4, all but the df explode bounded by the query docs)
    # + index(2) + score groupBy + topk window + the persisted query
    # frame's barrier; queries/dfreq must stay broadcast (smj would
    # mean a build side grew corpus-sized)
    "multi_query_search": (10, 0),  # +spread (restricted postings pass)
    # dedup family: candidate generation must stay bucketed —
    # exchange growth here means a corpus-sized shuffle crept in
    "dedup_exact": (1, 0),
    "dedup_ngram_jaccard": (5, 0),  # narrow shingles + bucket pairing; +spread
    # containment twin: identical bucket-pairing plan (shared shingle
    # scan, stop-shingle pruning before fan-out), different score
    "dedup_containment": (5, 0),  # +spread
    "dedup_prune_stats": (3, 0),  # +spread
    # bench headline (not in DRIVER_WINDOW itself): fan-out repartition
    # + band-bucket groupBy + candidate distinct; everything else
    # broadcasts. This pin would have caught the round-4 regression.
    "dedup_minhash_lsh": (3, 0),  # +spread x1 (banding pass; r19 dropped the
    # post-semi verify-pass spread — candidate-bounded, see normalized_tokens)
    "dedup_simhash_check": (6, 0),  # +spread x2 (query + exact-baseline passes)
    # CC runs to convergence while the plan is BUILT (iterative
    # localCheckpoint loop); the residual plan joins the BROADCAST
    # label set (near-dup-graph-sized) against the corpus — zero
    # shuffles, zero SMJ (round-5 verdict item 3 tightened these
    # from (2,2)/uncovered)
    "dedup_clusters": (0, 0),
    # residual plan: broadcast label join + rank window over graph
    # members only (1 exchange on cluster_id, tiny) + broadcast
    # anti-join for keep=1 singletons
    "dedup_canonicalize": (1, 0),
    # skew-safe twin: the rank window becomes a min_by agg (same one
    # cluster_id exchange, map-side combined) + broadcast winner join
    "dedup_canonicalize_skew": (1, 0),
    "dedup_embedding_cosine": (0, 0),  # block-key broadcast equi-join
    # span stats: md5-span occ groupBy + span_h window + doc rollup —
    # three narrow (hash, id, count) shuffles, final join broadcasts
    "dedup_span_stats": (5, 0),  # +spread x2 (n_spans + explode passes)
    # span trim: one span_h window shuffle + one doc collect_list
    # shuffle; the token rebuild joins per-doc position arrays back
    # via broadcast — span/token text never shuffles
    "dedup_span_trim": (4, 0),  # +spread x2 (same two passes)
    # incremental: the band equi-join between the two corpora's
    # (band, band_hash, id) frames is big-big BY DESIGN (SMJ is the
    # intended plan — neither snapshot broadcasts at 100 TB); the
    # second SMJ is the doc-level rollup left join, which AQE
    # broadcast-swaps at runtime when matches are small. 2 of the 5
    # exchanges are the small-scan fan-out gate (skips at scale).
    "dedup_incremental": (5, 2),  # +spread x2 (batch + reference banding;
    # r19 dropped the two verify-pass spreads — candidate-bounded)
    # check sweep composes matches (executed ONCE, persisted for its
    # three consumers) + exact twin + rollup (same class as
    # dedup_minhash_lsh_check: stats-less derived-frame SMJs are
    # expected inside *_check verification queries)
    "dedup_incremental_check": (24, 4),  # +spread x3 (banding passes only
    # since r19; the sweep's exact twin keeps its own corpus spreads)
    # ANN family: exact baselines are one top-k shuffle; the *_check
    # sweeps compare approx vs exact so they carry both plans' shuffles
    # (SMJ between two derived frames without stats is expected there)
    "ann_cosine_topk": (1, 0),
    "ann_cosine_topk_int8": (1, 0),
    "ann_cosine_topk_lsh": (1, 0),
    "ann_cosine_topk_ivf": (1, 0),
    "ann_cosine_topk_pq": (1, 0),
    "dedup_simhash": (3, 0),  # +spread x2 (token pass per consumer)
    # SemDeDup: the cell self-join and the id-key prune join are both
    # corpus×corpus BY DESIGN (neither side broadcasts at 100 TB; with
    # one cell-key regroup feeding the per-cell BLAS applyInPandas —
    # no pair join, no flag join (round-7 rework)
    "semantic_dedup": (1, 0),
    # MMR: brute-force candidates + one corpus scan for vectors; the
    # candidate-candidate pair join and the cogroup run on query_id —
    # SMJ is the INTENDED plan there (both sides are Q x C candidate
    # frames that scale with the query batch; broadcasting them would
    # cap Q)
    "mmr_rerank": (4, 2),
    "mmr_rerank_check": (7, 2),
    # A-Res weighted sample: narrow key projection + one stratum window
    "weighted_sample": (1, 0),
    # two-level epoch shuffle: ONE block hash-partition exchange + a
    # per-partition sort — the whole point vs corpus_shuffle's 3
    "block_shuffle": (1, 0),
    # fingerprint full-outer on id: SMJ is the intended plan — both
    # snapshot sides are corpus-sized, nothing is broadcastable
    "snapshot_diff": (2, 2),
    # roundtrip compose: the diff's full-outer + the changelog payload
    # join + the apply anti-join, each an SMJ between derived
    # corpus-sized frames pre-AQE (runtime broadcast-swaps the
    # edit-volume sides); exchanges are their co-partitionings
    "changelog_roundtrip": (8, 8),
    # check: operator + independent recheck + all-pairs exact baseline
    # (labeled, check scale only) — derived-frame SMJs expected
    "semantic_dedup_check": (8, 2),
    "ann_lsh_check": (12, 4),
    "ann_ivf_check": (12, 4),
    "ann_pq_check": (12, 4),
    "dedup_minhash_lsh_check": (18, 2),  # +spread x3 (r19: the query's
    # verify-pass spread dropped — candidate-bounded)
    "uv_approx_check": (6, 2),
    # text/decontam: broadcast benchmark shingles + one (id,1) shuffle
    "decontaminate": (4, 0),  # +spread x2 (train + eval shingle passes)
    # leakage-safe split: CC runs while the plan is BUILT; the residual
    # plan is broadcast label join + broadcast anti-join + bucket
    # projection — same zero-shuffle class as dedup_clusters
    "leakage_safe_split": (0, 0),
    # scorecard: every signal a JVM expression over one scan, map-side
    # combined into a single |sources|-row shuffle
    "source_scorecard": (1, 0),
    # unigram-LM scoring: token-count groupBy + 1-row total + per-doc
    # rollup (the LM branch's shuffle appears twice pre-AQE because the
    # count frame feeds both the total and the join; ReuseExchange
    # collapses it at runtime). LM join must stay broadcast.
    "doc_logprob": (4, 0),
    # bigram-LM scoring: bigram-count groupBy (appears twice pre-AQE —
    # model join + context window branch), w1 context window, unigram
    # groupBy ×2 (total + backoff join), per-doc rollup; every join
    # must stay broadcast (the bigram model join is unhinted — AQE may
    # downgrade it at pathological vocab, which would fail this pin
    # loudly rather than silently regress)
    "doc_bigram_logprob": (6, 0),
    # hashed classifier: hash + integer weight inside the scan
    # projection, ONE map-side-combined (id, n, Σw) shuffle — no join,
    # no model shipping
    "clf_quality_score": (1, 0),
    # vocab audit: token-count groupBy feeding a TakeOrdered top-k (no
    # global sort exchange) + per-doc rollup; vocab join must broadcast
    "vocab_oov_rate": (2, 0),
    # feature-hashing embedder: (id, bucket) count BEFORE the dim
    # fan-out + (id, dim) rollup — integer triples only, no join
    "doc_embedding_hash": (3, 0),  # +spread (token/bucket pass)
    # winnowing fingerprints: tokenize/shingle/hash/window-min all in
    # per-row array expressions over one pushed scan — ZERO shuffle
    "doc_winnow_fingerprint": (1, 0),  # zero-shuffle pipeline +spread
    # overlap pairs on the winnowed sub-sample: fp distinct + per-doc
    # sizes + hash-bucket groupBy + pair groupBy (the containment_pairs
    # shape over ~2/(w+1) of the items); size joins must broadcast —
    # an SMJ here means a corpus-sized build side crept in
    "winnow_overlap_pairs": (6, 0),  # +spread (fingerprint pass)
    # composed semantic pairs: the embedder's two shuffles (duplicated
    # pre-AQE across the pair join's sides, ReuseExchange collapses) +
    # vec assembly + block equi-join; block/pair joins broadcast at
    # test SF
    "doc_semantic_pairs": (6, 0),
    # blocked fuzzy linkage: block-key equi-join broadcasts at test SF
    # (a degrade to SMJ — the intended plan when neither catalog side
    # broadcasts at 100 TB — would fail this pin loudly, which is the
    # point: it means stats changed underneath the query)
    # +2 narrow exchanges since r8: the armed max_block hot-block cap
    # adds a block-count aggregation (broadcast back as the hot set)
    # +spread (r19): the catalog scan is spread before the candidate
    # join (the probe side was ONE task on single-file input, with the
    # whole Levenshtein verify serialized on it); the spread subtree
    # appears under the hot agg and both join sides pre-AQE (4 static
    # occurrences, ReuseExchange collapses at runtime)
    "fuzzy_part_matches": (6, 0),
    # PSI drift: one conditional-agg (type, bucket) corpus shuffle
    # (appears twice pre-AQE — grid branch + join branch, ReuseExchange
    # collapses it) + tiny distinct/window/final aggs; grid join must
    # stay broadcast
    "value_drift_psi": (4, 0),
    # overlap matrix: per-shingle collect_set groupBy feeds the pair
    # branch and the sizes branch (duplicated pre-AQE), + one pair
    # count + one sizes count; size joins must stay broadcast
    "source_overlap": (6, 0),
    # sampling / release family
    "export_shards": (3, 0),  # two-pass range partition
    "corpus_shuffle": (3, 0),  # same two-pass machinery over the md5 key
    "profile_documents": (2, 0),
    "sequence_packing": (1, 0),
    "mixture_resample": (3, 0),
    # multimodal family: narrow mapInPandas, zero shuffle
    "media_decode_meta": (0, 0),
    "media_frame_sample": (0, 0),
    # long-form full-outer self-compare (numpy path vs JVM recompute):
    # both sides are docs×8 and full_outer can't broadcast, so the SMJ
    # co-partition IS the intended plan; check-only, never in bench
    "media_features_check": (3, 2),
    "media_phash": (0, 0),  # narrow mapInPandas over a pushed 2-col scan
    # persisted signature table read by both self-join sides (one
    # payload-hash pass); 1 exchange = the pair-distinct
    "media_phash_dedup": (1, 0),
    # the registered query parity-splits the corpus, so its "batch" is
    # NOT small: no broadcast hints (a corpus-sized batch must degrade
    # to a shuffle, not die on the broadcast ceiling — the pagerank
    # broadcast_ranks precedent); post-persist stats are unknown, so
    # the STATIC plan shows SMJs that AQE broadcasts at runtime when a
    # side is genuinely small (the media_features_check convention)
    "media_phash_incremental": (3, 2),
    # winnow decontamination: both sides' fingerprint distincts + the
    # fp_hash join + two id-level rollups over the persisted hit frame
    # + the final id join. Post-persist stats are unknown, so the
    # STATIC plan shows 2 SMJs that AQE broadcasts at runtime when the
    # eval index / rollup side is genuinely small (the
    # media_phash_incremental convention; broadcast_eval=True forces
    # the hint for AQE-less pipelines). Every joined frame is
    # 40-bit-hash tuples from the ~2/(w+1) winnowed sub-sample — never
    # text, never the corpus.
    "winnow_decontaminate": (8, 2),  # +spread x2 (train + eval fingerprint passes)
    # the multi-benchmark generalization: same shape + the second
    # benchmark's fingerprint branch in the unioned index; post-join
    # frames hit-sized, keyed (doc, bench)
    "winnow_decontaminate_multi": (10, 2),  # +spread x3 (train + 2 benchmark splits)
    # spans consumer: train fingerprints -> hash semi-join against the
    # eval index (broadcasts; the distinct eval hash frame is
    # benchmark-sized) -> matched-position distinct -> islands window.
    # Every post-fingerprint frame is contamination-sized.
    "winnow_contaminated_spans": (5, 0),  # +spread
    # excision: the spans pipeline + per-doc span-list rollup, then
    # the corpus joins the contamination-sized span lists broadcast
    # (4 BHJ at test SF) and trims in a per-row HOF — the corpus
    # itself crosses no exchange
    "winnow_decontaminate_trim": (5, 0),  # +spread
}


def test_every_registered_query_is_pinned():
    """Round-4 verdict #4, widened in round 6 from the driver window to
    the WHOLE registry: every registered query needs a plan pin so a
    shape change (new shuffle, degraded broadcast) fails pytest before
    the bench or a driver row measures it. Registering a query without
    a PLAN_BOUNDS entry fails here."""
    unpinned = [n for n in all_queries() if n not in PLAN_BOUNDS]
    assert not unpinned, f"registered queries without a plan pin: {unpinned}"


import pytest


@pytest.fixture(scope="module")
def plan_sweep(spark, sf_dir):
    """ONE registry sweep shared by the shape pins and the nested-loop
    guard (r10 second-review finding: two independent sweeps each
    rebuilt every query's plan, which for the driver-loop queries —
    bpe_train_merges, bpe_tokenize_stats, source_pagerank, the CC
    family — means fully EXECUTING the iterative computation twice
    per pytest run for identical plan text)."""
    sweep: dict[str, tuple[dict, str]] = {}
    for name, q in all_queries().items():
        a = audit(q.fn(spark, sf_dir))  # audit carries the plan text
        sweep[name] = (a, a["plan"])
    return sweep


def test_plan_shapes(plan_sweep):
    problems = []
    for name, (max_ex, max_smj) in PLAN_BOUNDS.items():
        a = plan_sweep[name][0]
        if a["exchanges"] > max_ex:
            problems.append(f"{name}: {a['exchanges']} exchanges > {max_ex}")
        if a["smj"] > max_smj:
            problems.append(f"{name}: {a['smj']} sort-merge joins > {max_smj}")
    assert not problems, "; ".join(problems)


# Per-query BroadcastNestedLoopJoin ceilings (r9 verdict item 3: the
# old 4-query sample let a broadcast-HASH join degrade to a
# nested-loop join in the other 144 queries without failing pytest —
# BNLJ adds neither an exchange nor an SMJ, so PLAN_BOUNDS can't see
# it). Every entry is one of exactly two legitimate classes:
#   (s) 1-row scalar broadcast — crossJoin(broadcast(<1-row agg>)):
#       corpus totals, grid bounds, quantile rows, normalizers. The
#       build side is a single row at ANY scale factor.
#   (c) check-scale exact baseline — the *_check property oracles and
#       the labeled brute-force ANN/MMR rows recompute an exact
#       all-pairs answer over a broadcast-sized query/sample set;
#       never in bench, meta-guarded to check scale.
# Queries not listed must have ZERO BNLJ and ZERO CartesianProduct —
# a new nested-loop join anywhere else is a degraded broadcast-hash
# join until proven otherwise.
BNLJ_BOUNDS = {
    # (s) scalar-broadcast class
    "basket_lift": 2, "bm25_search": 2, "doc_bigram_logprob": 2,
    # (s) hybrid fusion inherits BOTH scalar-broadcast crosses: the
    # BM25 1-row stats fold and the dense side's broadcast query
    # cross (each tree+detail double-counted -> 4)
    "hybrid_rrf_search": 4,
    "doc_logprob": 2, "events_gapfill": 2, "events_gapfill_interp": 2,
    "heavy_hitters": 2, "mixture_resample": 2, "multi_query_search": 3,
    "rfm_segments": 2, "source_divergence": 2, "tfidf_top_terms": 2,
    "tpch_q11": 2, "tpch_q22": 2, "training_mix_snapshot": 2,
    "word_pmi": 2, "value_drift_psi": 4,
    # (c) exact-baseline / property-check class
    "ann_cosine_topk": 2, "ann_cosine_topk_int8": 2,
    "ann_cosine_topk_pq": 2, "mmr_rerank": 4,
    "ann_lsh_check": 10, "ann_ivf_check": 10, "ann_pq_check": 14,
    "mmr_rerank_check": 8, "semantic_dedup_check": 6,
    "dedup_minhash_lsh_check": 4, "dedup_simhash_check": 4,
    "dedup_incremental_check": 8, "heavy_hitters_check": 10,
    # (s)-adjacent: non-equi t1 < t2 pair enumeration over the distinct
    # event-type frame (a handful of rows at any scale — event types
    # are a semantic dimension, not data-sized) + the pair joins that
    # carry it; every build side is k x |types| at most
    "kmv_set_cardinality": 6,
    # (s)-adjacent like kmv_set_cardinality: the non-equi set_a <
    # set_b pair enumeration over the per-SOURCE stats frame (20 rows
    # at any SF — sources are a semantic dimension) plus the joins
    # carrying the pair frame; every build side is |sets| or
    # k x |sets| rows
    "kmv_pair_intersections": 6,
    # (s) scalar-broadcast class: the corpus-centroid frame is ONE row
    # (a 64-element array) broadcast onto the |labels|-row side — one
    # join, counted twice by the formatted plan's tree+detail sections
    "embedding_drift": 2,
    # (s) scalar-broadcast class: the 1-row global-bounds frame onto
    # the orders scan (one join, tree+detail double count)
    "zorder_layout": 2,
    # (s) scalar-broadcast class: the 1-row global sensitive-value
    # histogram (ordered (value,count) list + total + m) crossed onto
    # the |classes|-row frame (one join, tree+detail double count)
    "t_closeness_audit": 2,
    # (s) same 1-row histogram cross, inside the funnel's embedded
    # weighted t-closeness stage
    "release_gate_snapshot": 2,
}


def test_no_cartesian_or_unpinned_nested_loop_join(plan_sweep):
    """Sweep of EVERY registered query's physical-plan text: no
    CartesianProduct anywhere, and BroadcastNestedLoopJoin only in the
    allowlisted scalar-broadcast / check-baseline plans, within each
    plan's pinned ceiling."""
    import re

    problems = []
    for name, (_, plan) in plan_sweep.items():
        cart = len(re.findall(r"CartesianProduct", plan))
        bnlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        if cart:
            problems.append(f"{name}: {cart} CartesianProduct")
        if bnlj > BNLJ_BOUNDS.get(name, 0):
            problems.append(
                f"{name}: {bnlj} BroadcastNestedLoopJoin > "
                f"{BNLJ_BOUNDS.get(name, 0)} allowed"
            )
    assert not problems, "; ".join(problems)


def test_iterative_loop_body_shapes(spark, sf_dir):
    """r15 verdict item 2: the iterative operators (PageRank, the CC
    hash-to-min loop) return localCheckpoint frames whose lineage is
    CUT, so the registry sweep above audits only their residual plans
    (0 shuffles) while the real per-round cost — one edges-sized join
    plus one aggregate shuffle — lives in a loop body no registered
    query's explain() can see. Pin ONE un-checkpointed round here via
    the shared-body audit surfaces (operators/graph.py:_pr_round /
    operators/dedup.py:_cc_round — the loop executes the SAME
    function, so the audited plan is the executed round by
    construction).

    Auto-broadcast is disabled for the audit, which makes the pins
    data-size-independent HINT detection: any BroadcastHashJoin left
    in the plan comes from a forced hint. The scale contract being
    pinned: the rank/label side of the per-round join is NEVER
    hint-broadcast (a billion-node rank frame must shuffle, not
    collect through the driver — the r15 broadcast_ranks default), and
    the only hinted build in the PageRank round is the one-time wsum
    frame. Join counts are doubled by the formatted plan's
    tree+details sections (the BNLJ sweep's convention)."""
    from pyspark.sql import functions as F

    from flink_kafka_spark.operators.dedup import cc_loop_body
    from flink_kafka_spark.operators.graph import pagerank_loop_body
    from flink_kafka_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    edges = docs.select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") + 1).alias("dst"),
        F.lit(1).cast("long").alias("w"),
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        pr = audit(pagerank_loop_body(edges, nodes))
        pr_hinted = audit(
            pagerank_loop_body(
                edges, nodes, broadcast_ranks=True, broadcast_wsum=True
            )
        )
        cc = audit(cc_loop_body(pairs, jump=True))
        cc_plain = audit(cc_loop_body(pairs, jump=False))
    finally:
        # restore the SESSION'S configured value, not Spark's default:
        # conf.unset would fall back to the 10 MB ConfigEntry default
        # instead of session.py's 64 MB, leaking a 6x-smaller broadcast
        # threshold into every later test (session-scoped fixture)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    problems = []
    # PageRank round, default hints OFF everywhere (r16: the wsum hint
    # became opt-in too — a node-count-sized forced broadcast dies on
    # the driver ceiling for a billion-node graph): NO broadcast node
    # may appear; both the setup wsum join and the per-round rank join
    # are shuffle joins the planner/AQE may upgrade at runtime.
    if pr["broadcasts"] != 0:
        problems.append(
            f"pagerank round: {pr['broadcasts']} != 0 broadcast nodes — "
            "a forced hint reached the rank or wsum side"
        )
    if pr["smj"] != 4 or pr["exchanges"] > 4:
        problems.append(
            f"pagerank round shape drifted: smj={pr['smj']} (want 4), "
            f"exchanges={pr['exchanges']} (ceiling 4)"
        )
    # the canary that the mechanism detects forced hints at all: with
    # BOTH opt-ins armed, both joins must show as broadcasts (4 = two
    # joins, tree+detail doubled) and no SMJ remains
    if pr_hinted["broadcasts"] != 4 or pr_hinted["smj"] != 0:
        problems.append(
            "hint-detection canary broken: broadcast_ranks+broadcast_wsum "
            f"shows bc={pr_hinted['broadcasts']} (want 4), "
            f"smj={pr_hinted['smj']} (want 0)"
        )
    # CC round (pointer jumping engaged — worst case): label joins are
    # NEVER hint-broadcast; 3 SMJ nodes = msgs join duplicated across
    # the self-join's two branches (ReusedExchange collapses at
    # runtime) + the jump join itself.
    if cc["broadcasts"] != 0 or cc["smj"] != 6 or cc["exchanges"] > 9:
        problems.append(
            f"cc jumping round shape drifted: bc={cc['broadcasts']} "
            f"(want 0), smj={cc['smj']} (want 6), "
            f"exchanges={cc['exchanges']} (ceiling 9)"
        )
    # plain round: one msgs join + the min-groupBy
    if cc_plain["broadcasts"] != 0 or cc_plain["smj"] != 2 or cc_plain["exchanges"] > 4:
        problems.append(
            f"cc plain round shape drifted: bc={cc_plain['broadcasts']} "
            f"(want 0), smj={cc_plain['smj']} (want 2), "
            f"exchanges={cc_plain['exchanges']} (ceiling 4)"
        )
    assert not problems, "; ".join(problems)
