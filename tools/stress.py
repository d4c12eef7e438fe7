#!/usr/bin/env python3
"""Scale probe: run headline operator shapes on synthetic data 10-100x
larger than sf0.1 (generated distributed via spark.range — no files),
printing one JSON line of timings. Evidence that the operator shapes
scale, complementing bench.py's fixed-SF measurements.

Usage: python tools/stress.py [n_events] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_kafka_spark.operators.dedup import (  # noqa: E402
    connected_components,
    minhash_lsh_pairs,
)
from flink_kafka_spark.operators.topn import topn_counts_per_window  # noqa: E402
from flink_kafka_spark.operators.windows import windowed_count, windowed_distinct  # noqa: E402
from flink_kafka_spark.session import get_spark  # noqa: E402


def synth_events(spark, n: int):
    """Deterministic synthetic event stream: ~1 week of data, zipf-ish
    hot users (hash-squared skew), 5 event types."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.xxhash64("id"), F.lit(604_800))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("view", "click", "purchase", "error", "scroll")]),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
    )


def synth_docs(spark, n: int):
    """Synthetic documents: ~40-token bodies from a deterministic
    vocabulary, with every 10th doc a near-duplicate of its neighbor."""
    words = F.expr(
        "transform(sequence(0, 39), i -> concat('w', pmod(xxhash64(id - pmod(id, 10) "
        "+ CASE WHEN pmod(id, 10) = 9 THEN 1 ELSE pmod(id, 10) END, i), 500)))"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark(app_name="stress")
    timings = {}

    ev = synth_events(spark, n_events)
    t0 = time.perf_counter()
    counts = windowed_count(ev, "ts", "1 hour", "15 minutes", keys=["user_id"])
    topn_counts_per_window(counts, "user_id", 5).write.format("noop").mode("overwrite").save()
    timings[f"hot_items_topn_{n_events}"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    windowed_distinct(ev, "ts", "1 day", "user_id", approximate=True).write.format(
        "noop"
    ).mode("overwrite").save()
    timings[f"uv_approx_{n_events}"] = round(time.perf_counter() - t0, 2)

    docs = synth_docs(spark, n_docs)
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    n_pairs = pairs.count()
    timings[f"minhash_lsh_{n_docs}"] = round(time.perf_counter() - t0, 2)

    # connected components on a graph with known structure: chains of
    # length 10 (every doc i linked to i+1 except at decade borders)
    # -> exactly n/10 components, diameter 9 forces multiple rounds
    t0 = time.perf_counter()
    edges = (
        spark.range(n_docs)
        .filter("pmod(id, 10) < 9")
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    nodes = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    cc = connected_components(edges, nodes, id_col="doc_id")
    n_components = cc.select("cluster_id").distinct().count()
    timings[f"connected_components_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert n_components == n_docs // 10, n_components

    # canonicalize (keep-best) on planted clusters: same chain graph ->
    # n/10 clusters of 10; the quality column plants ONE known winner
    # per cluster (the member whose within-cluster offset equals
    # cluster_index mod 10), so the probe asserts EXACT keep-set
    # recovery — winner identity, not just row counts — while timing
    # the composed labels->broadcast-join->rank pipeline at scale.
    from flink_kafka_spark.operators.dedup import canonicalize_clusters

    t0 = time.perf_counter()
    winner = F.pmod(F.col("doc_id"), F.lit(10)) == F.pmod(
        F.floor(F.col("doc_id") / 10), F.lit(10)
    )
    planted = F.when(winner, F.lit(1.0)).otherwise(F.lit(0.1))
    keep = canonicalize_clusters(nodes, edges, id_col="doc_id", quality=planted).filter(
        "keep = 1"
    )
    stats = keep.agg(
        F.count("*").alias("n"),
        F.sum((~winner).cast("int")).alias("wrong_winner"),
    ).collect()[0]
    timings[f"canonicalize_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert stats.n == n_docs // 10 and stats.wrong_winner == 0, tuple(stats)

    # pointer-jumping adversarial probe (round-6 verdict #4): ONE chain
    # of 100k nodes — diameter 10^5, the worst case for hash-to-min
    # label propagation, whose plain loop needs O(diameter) rounds and
    # would hit ANY practical round cap. Pointer jumping (L(v) <-
    # L(L(v)) from round 3 on) doubles label reach per round, so the
    # loop must converge in ~log2(10^5) ~ 17 jumping rounds; max_iter
    # 25 makes the assertion mechanical — without the shortcut join
    # this raises the non-convergence RuntimeError instead of passing
    # slowly. The diameter-9 chains above barely enter the jumping
    # rounds; this is the shape the O(log d) claim exists for.
    n_chain = 100_000
    t0 = time.perf_counter()
    chain_edges = spark.range(n_chain - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    chain_nodes = spark.range(n_chain).select(F.col("id").alias("doc_id"))
    cc_chain = connected_components(
        chain_edges, chain_nodes, id_col="doc_id", max_iter=25
    )
    n_comp = cc_chain.select("cluster_id").distinct().count()
    timings[f"cc_single_chain_{n_chain}"] = round(time.perf_counter() - t0, 2)
    assert n_comp == 1, n_comp

    # span-level substring dedup at the full doc count: every 10th doc
    # is a near-verbatim copy of its neighbor, so ~2 docs per decade
    # share most 10-token spans — n_dup_spans must be nonzero for at
    # least the planted fraction, and the explode volume (~31 spans/doc)
    # is the probe's real subject: the plan must stay (hash, id, count)
    # shuffles with no corpus-text movement.
    from flink_kafka_spark.operators.dedup import span_dup_stats

    t0 = time.perf_counter()
    span_stats = span_dup_stats(docs, n=10)
    n_dup_docs = span_stats.filter("n_dup_spans > 0").count()
    timings[f"span_dup_stats_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert n_dup_docs >= n_docs // 10, n_dup_docs  # every planted pair flagged

    # span trim at the full doc count: doc 10k+9 is a verbatim copy of
    # doc 10k+1, so the non-owner copy must trim to NOTHING (all its
    # spans are owned by the lower id) while the owner keeps every
    # token — exact excision ground truth at 100k docs.
    from flink_kafka_spark.operators.dedup import trim_duplicated_spans

    t0 = time.perf_counter()
    trimmed = trim_duplicated_spans(docs, n=10)
    n_emptied = trimmed.filter(
        "pmod(doc_id, 10) = 9 AND n_removed_tokens = n_tokens"
    ).count()
    timings[f"span_trim_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert n_emptied == n_docs // 10, n_emptied

    # incremental dedup: the synthetic construction makes doc 10k+9 a
    # verbatim copy of doc 10k+1, so splitting "the copies" (pmod 9)
    # off as tonight's batch against everything else as the reference
    # puts every planted pair ACROSS the split: all n/10 batch docs
    # must come back non-novel (identical docs collide in every band —
    # recall 1 at jaccard 1.0).
    from flink_kafka_spark.operators.dedup import incremental_dedup

    t0 = time.perf_counter()
    inc = incremental_dedup(
        docs.filter("pmod(doc_id, 10) = 9"),
        docs.filter("pmod(doc_id, 10) != 9"),
        threshold=0.5,
    )
    n_flagged = inc.filter("is_novel = 0").count()
    timings[f"incremental_dedup_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert n_flagged == n_docs // 10, n_flagged

    # containment at the full doc count: doc 10k+9 is a VERBATIM copy
    # of doc 10k+1, so every planted pair must surface with containment
    # exactly 1.0 — same bucket-pairing shape as the Jaccard probe, so
    # the timing difference isolates the score change.
    from flink_kafka_spark.operators.dedup import containment_pairs

    t0 = time.perf_counter()
    cont = containment_pairs(docs, threshold=0.6)
    n_full = cont.filter(
        "pmod(id_a, 10) = 1 AND id_b = id_a + 8 AND containment = 1.0"
    ).count()
    timings[f"containment_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert n_full == n_docs // 10, n_full

    # quality-threshold sweep at the full doc count: 11 grid rows, the
    # t=0 row must account for every doc, and pass counts must be
    # monotone non-increasing in t (the suffix-sum correctness at a
    # scale where a bucket-boundary bug would actually show).
    from flink_kafka_spark.operators.text import quality_threshold_sweep

    t0 = time.perf_counter()
    sweep = sorted(
        quality_threshold_sweep(docs, steps=10).collect(), key=lambda r: r.threshold
    )
    timings[f"threshold_sweep_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert len(sweep) == 11 and sweep[0].n_docs_pass == n_docs
    assert all(
        a.n_docs_pass >= b.n_docs_pass and a.n_tokens_pass >= b.n_tokens_pass
        for a, b in zip(sweep, sweep[1:])
    )

    # SemDeDup at 100k embeddings with planted ground truth: 10k groups
    # of 10, each group a deterministic ±1/√64 base direction with
    # member j flipping component j — cos(member j>0, member 0) =
    # 62/64 ≥ τ=0.9 (and cross-member 60/64 also prunes, which is
    # fine: members only ever prune members) while cross-group cos
    # needs 61-of-64 sign agreement between independent ±1 directions
    # (P ≈ 2.4e-15/pair — unreachable at ~20M within-cell pairs; the
    # earlier dim-32 construction admitted genuine 31/32 collisions at
    # P ≈ 7.7e-9, which DID fire at this scale, and whether the
    # colliding pair shared a cell made the probe k-means-flaky). So
    # the min-id survivor rule must NEVER prune a group head, and must
    # prune ~90% of the corpus — up to k-means cell straddle (a group
    # split across cells can't see all its prunes; measured straddle
    # loss ≈ a few %, bound leaves margin).
    from flink_kafka_spark.operators.similarity import semantic_dedup

    n_vecs = 100_000
    t0 = time.perf_counter()
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), c -> "
            " CAST(pmod(xxhash64(floor(id / 10), c), 2) * 2 - 1 AS DOUBLE)"
            " * (CASE WHEN pmod(id, 10) > 0 AND c = pmod(id, 10) THEN -1.0 ELSE 1.0 END))"
        ).alias("embedding"),
    )
    sd = semantic_dedup(emb, n_cells=256, threshold=0.9)
    sd_stats = sd.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("keep") == 0) & (F.pmod("vec_id", F.lit(10)) == 0)).cast("int")).alias(
            "pruned_heads"
        ),
        F.sum((F.col("keep") == 0).cast("int")).alias("pruned"),
    ).collect()[0]
    timings[f"semantic_dedup_{n_vecs}"] = round(time.perf_counter() - t0, 2)
    assert sd_stats.n == n_vecs and sd_stats.pruned_heads == 0, tuple(sd_stats)
    assert sd_stats.pruned >= 0.75 * (n_vecs * 9 // 10), sd_stats.pruned

    # unigram-LM scoring at the full doc count: the synthetic vocab is
    # 500 near-uniformly-used words, so every doc's average negative
    # log-prob must sit near ln(500) ~ 6.21 — a ground-truth band, not
    # just a row count. The probe's real subject is the two-shuffle
    # shape: one token groupBy for the LM, one per-doc rollup, LM
    # broadcast between them.
    from flink_kafka_spark.operators.text import unigram_logprob

    t0 = time.perf_counter()
    lp = unigram_logprob(docs)
    lp_stats = lp.agg(
        F.count("*").alias("n"), F.avg("avg_neg_logprob").alias("m")
    ).collect()[0]
    timings[f"doc_logprob_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert lp_stats.n == n_docs and 5.5 < lp_stats.m < 7.0, tuple(lp_stats)

    # cross-source overlap matrix with 20 planted sources over ONE
    # shared vocabulary: all 190 unordered pairs must appear with
    # nonzero jaccard. Times the per-shingle collect_set + pair-explode
    # shape (~38 shingles/doc exploding off a 100k-doc scan) — the
    # plan's per-shingle state is bounded by the source count.
    from flink_kafka_spark.operators.dedup import source_overlap_matrix

    t0 = time.perf_counter()
    sourced = docs.withColumn(
        "source", F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20)))
    )
    ov = source_overlap_matrix(sourced).collect()
    timings[f"source_overlap_{n_docs}"] = round(time.perf_counter() - t0, 2)
    # full 190-pair saturation is a DENSITY property of the default
    # corpus size; a smaller CLI n_docs legitimately yields fewer
    # overlapping pairs (observed: 13 at n_docs=2000)
    assert all(r.jaccard > 0 for r in ov), "zero-jaccard pair emitted"
    assert len(ov) == 190 if n_docs >= 50_000 else len(ov) <= 190, len(ov)

    # leakage-safe split on the known chain graph: every decade chain
    # is one cluster, so all 10 members must co-assign — zero pairs may
    # straddle a split boundary (the anti-leakage guarantee at 100k
    # nodes), and the three splits must all be non-empty.
    from flink_kafka_spark.operators.sampling import grouped_split

    t0 = time.perf_counter()
    sp = grouped_split(cc, "cluster_id")
    ed_a = sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    ed_b = sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    crossed = edges.join(ed_a, "id_a").join(ed_b, "id_b").filter("sa <> sb").count()
    n_splits = sp.select("split").distinct().count()
    timings[f"leakage_safe_split_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert crossed == 0 and n_splits == 3, (crossed, n_splits)

    # retrieval ops at 10x the sf0.1 corpus: the inverted index is the
    # explode-heavy shape (vocab 500, ~40 tokens/doc -> ~2M postings),
    # BM25 is two narrow passes + a broadcast stats row. Both must stay
    # explode/scan-bound, no driver collects.
    from flink_kafka_spark.operators.text import bm25_search, inverted_index

    t0 = time.perf_counter()
    n_postings = inverted_index(docs, min_df=2).count()
    timings[f"inverted_index_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert n_postings > n_docs, n_postings  # every doc posts >=1 shared term

    t0 = time.perf_counter()
    hits = bm25_search(docs, ["w1", "w2", "w3"], k=10).collect()
    timings[f"bm25_search_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert len(hits) == 10 and all(r.score > 0 for r in hits), hits

    # fuzzy-linkage hot-block probe (round-7 verdict #6): plant a
    # catalog where 20% of rows share one first token — the
    # block-quadratic shape the operator docstring warns about. The
    # hot block is H = n/5 rows -> ~H² = 100M raw candidates at the
    # default 50k. Two cost regimes, probed separately:
    # - OUT-OF-BAND candidate mass (join output discarded by the
    #   length-band filter): max_block folds the band into the join
    #   key, removing it losslessly — this catalog plants lengths in
    #   steps of 4 (> max_dist), so nearly all of the 100M candidate
    #   pairs are out-of-band and the cap's saving is the observable
    #   (measured ~2x wall at 50k; the ratio grows with H since
    #   uncapped mass is H² vs capped H²/buckets).
    # - IN-BAND verify mass (pairs the band admits): irreducible under
    #   ANY lossless refinement — the selectivity of the blocking key
    #   is the only lever (which is why fuzzy_part_matches uses a
    #   composite key AND arms max_block).
    # The probe asserts the capped pair set is IDENTICAL (the lossless
    # claim of test_fuzzy_match_pairs_hot_block_cap_is_lossless, at
    # scale) and the wall saving is real.
    from flink_kafka_spark.operators.joins import fuzzy_match_pairs

    n_fuzzy = 50_000
    catalog = spark.range(n_fuzzy).select(
        F.col("id"),
        F.when(
            F.pmod("id", F.lit(5)) == 0,
            # hot first token; lengths step by 4 over ~40 band buckets
            F.concat(
                F.lit("hot "),
                F.repeat(
                    F.lit("abcd"),
                    (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(40)) + 1).cast("int"),
                ),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("tok"),
                F.pmod(F.xxhash64("id", F.lit(5)), F.lit(2000)).cast("string"),
                F.lit(" part_"),
                F.pmod(F.xxhash64("id"), F.lit(4000)).cast("string"),
            )
        )
        .alias("name"),
    ).persist()
    catalog.count()
    t0 = time.perf_counter()
    n_uncapped = fuzzy_match_pairs(catalog, "id", "name").count()
    t_uncapped = round(time.perf_counter() - t0, 2)
    timings[f"fuzzy_hot_block_uncapped_{n_fuzzy}"] = t_uncapped
    t0 = time.perf_counter()
    n_capped = fuzzy_match_pairs(catalog, "id", "name", max_block=1000).count()
    t_capped = round(time.perf_counter() - t0, 2)
    timings[f"fuzzy_hot_block_capped_{n_fuzzy}"] = t_capped
    assert n_capped == n_uncapped, (n_capped, n_uncapped)
    # the timing claim is reported, not hard-asserted: wall ratios on
    # this box flap with ambient load (bench-baseline policy), and a
    # spurious trip here would kill the whole sweep after its
    # expensive earlier probes; the lossless invariant above is the
    # correctness gate
    print(
        f"fuzzy hot-block cap ratio: {t_uncapped}s uncapped / {t_capped}s capped",
        file=sys.stderr,
    )
    catalog.unpersist()

    # AQE skew-join probe: README's "residual join skew by AQE
    # skew-join" claim, demonstrated rather than asserted. A planted
    # 30%-hot key forces one reduce partition to dwarf the rest in a
    # fact-fact SMJ (broadcast disabled, skew thresholds scaled to the
    # probe size); the FINAL adaptive plan must carry the skew=true
    # split marker. The tiny post-join filter keeps the collect
    # driver-safe while executing through the SAME QueryExecution —
    # a noop write would finalize a different one and never show the
    # adaptive plan.
    skew_saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
        n_skew = 5_000_000
        sa = spark.range(n_skew).select(
            F.when(F.pmod("id", F.lit(10)) < 3, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("va"),
        )
        sb = spark.range(n_skew).select(F.col("id").alias("k"), (F.col("id") * 2).alias("vb"))
        sj = sa.join(sb, "k").filter((F.col("va") + F.col("vb")) % 1_000_000 == 7)
        t0 = time.perf_counter()
        skew_rows = sj.collect()
        timings[f"aqe_skew_join_{n_skew}"] = round(time.perf_counter() - t0, 2)
        skew_plan = sj._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in skew_plan
        assert "skew=true" in skew_plan, "AQE skew split did not engage"
        assert len(skew_rows) == 5, len(skew_rows)
    finally:
        for k, v in skew_saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # Misra-Gries sketch at cardinality the exact groupBy would choke
    # on: ~1M distinct tail keys + 3 planted mega-keys over n_events
    # tokens. The probe asserts the PODS'12 guarantees at scale: the
    # mega-keys (each > n/(k+1)) all survive and no estimate violates
    # the n/(k+1) undercount bound vs their exact counts.
    from flink_kafka_spark.operators.sketches import misra_gries

    mega = ["mega_a", "mega_b", "mega_c"]
    toks = spark.range(n_events).select(
        F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 3,
               F.element_at(F.array(*[F.lit(m) for m in mega]),
                            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(3)) + 1).cast("int")))
        .otherwise(F.concat(F.lit("tail_"),
                            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)).cast("string")))
        .alias("tok")
    )
    t0 = time.perf_counter()
    sketch = {r["item"]: r["est"] for r in misra_gries(toks, "tok", k=16).collect()}
    timings[f"misra_gries_{n_events}"] = round(time.perf_counter() - t0, 2)
    exact_mega = {
        r["tok"]: r["c"]
        for r in toks.filter(F.col("tok").isin(mega)).groupBy("tok").agg(
            F.count(F.lit(1)).alias("c")).collect()
    }
    for m in mega:
        assert m in sketch, (m, sorted(sketch))
        assert sketch[m] <= exact_mega[m]
        assert (exact_mega[m] - sketch[m]) * 17 <= n_events, (m, sketch[m], exact_mega[m])

    # Count-Min sketch over the same ~1M-distinct token stream: the
    # whole shuffle is the <= d*w counter frame (32k keys at 4x8192)
    # regardless of the 1M-key space. Asserts the one-sided guarantee
    # (never undercounts) and a 4N/w overcount ceiling on the planted
    # mega-keys — each of the 4 rows exceeds 4x its mean collision
    # mass with prob ~1/4, all four simultaneously ~(1/4)^4.
    from flink_kafka_spark.operators.sketches import cms_estimate, count_min_sketch

    cms_w, cms_d = 8192, 4
    t0 = time.perf_counter()
    cms = count_min_sketch(toks, "tok", cms_w, cms_d)
    mega_df = spark.createDataFrame([(m,) for m in mega], "tok string")
    ests = {
        r["tok"]: r["est_c"]
        for r in cms_estimate(cms, mega_df, "tok", cms_w, cms_d).collect()
    }
    timings[f"count_min_{n_events}"] = round(time.perf_counter() - t0, 2)
    for m in mega:
        assert ests[m] >= exact_mega[m], (m, ests[m], exact_mega[m])
        assert ests[m] - exact_mega[m] <= 4 * n_events // cms_w, (
            m, ests[m], exact_mega[m])

    # KMV distinct sketch at ~1M true distinct: the threshold prefilter
    # must leave only O(k) survivors per set for the window sort (the
    # scale path), the estimate must land within 5.6 sigma (~50%) of
    # the exact countDistinct, and a below-k set stays EXACT.
    from flink_kafka_spark.operators.sketches import kmv_estimate, kmv_minima

    kmv_k = 128
    sets = spark.range(n_events).select(
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)) < 1, F.lit("small"))
        .otherwise(F.lit("big"))
        .alias("s"),
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)) < 1,
               F.pmod(F.xxhash64("id", F.lit(8)), F.lit(50)))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(9)), F.lit(1_000_000)))
        .cast("string")
        .alias("v"),
    )
    t0 = time.perf_counter()
    kept = kmv_minima(sets, "s", "v", kmv_k)
    kmv_est = {r["s"]: r["est"] for r in kmv_estimate(kept, kmv_k).collect()}
    timings[f"kmv_{n_events}"] = round(time.perf_counter() - t0, 2)
    exact_kmv = {
        r["s"]: r["c"]
        for r in sets.groupBy("s").agg(F.countDistinct("v").alias("c")).collect()
    }
    assert kmv_est["small"] == exact_kmv["small"], (kmv_est, exact_kmv)
    rel = abs(kmv_est["big"] - exact_kmv["big"]) / exact_kmv["big"]
    assert rel < 0.5, (kmv_est["big"], exact_kmv["big"], rel)

    # KMV pair set-algebra on a planted overlap: a = [0, 600k),
    # b = [400k, 1M) -> |a∩b| = 200k, |a∪b| = 1M (Jaccard 0.2), plus
    # two below-k sets overlapping on 15 values (exact path). The
    # pair computation consumes ONLY the k-row sketches — its wall
    # time must not grow with the sets' cardinality (recorded, and
    # the operator's only non-sketch input is the minima frame by
    # construction).
    from flink_kafka_spark.operators.sketches import kmv_pair_intersections

    ab = spark.range(1_000_000).select(
        F.when(F.col("id") < 600_000, F.lit("a")).otherwise(F.lit("b")).alias("s"),
        F.col("id").cast("string").alias("v"),
    ).unionByName(
        spark.range(400_000, 600_000).select(
            F.lit("b").alias("s"), F.col("id").cast("string").alias("v")
        )
    ).unionByName(
        spark.range(40).select(F.lit("c").alias("s"), F.col("id").cast("string").alias("v"))
    ).unionByName(
        spark.range(25, 65).select(F.lit("d").alias("s"), F.col("id").cast("string").alias("v"))
    )
    # materialize the sketches BEFORE the clock starts: kmv_minima is
    # lazy, so timing its build would charge the 1.24M-row scan to the
    # pair algebra and contradict the sketch-only claim above
    pair_minima = kmv_minima(ab, "s", "v", kmv_k).persist()
    pair_minima.count()
    t0 = time.perf_counter()
    got_pairs = {
        (r["set_a"], r["set_b"]): r for r in kmv_pair_intersections(pair_minima, kmv_k).collect()
    }
    timings["kmv_pair_intersections_1M"] = round(time.perf_counter() - t0, 2)
    pair_minima.unpersist()
    exact_small = got_pairs[("c", "d")]
    assert (exact_small["est_union"], exact_small["est_intersection"]) == (65, 15), (
        tuple(exact_small)
    )
    # exact differences: c = 0..39, d = 25..64 -> 25 on each side
    assert (exact_small["est_a_minus_b"], exact_small["est_b_minus_a"]) == (25, 25), (
        tuple(exact_small)
    )
    big = got_pairs[("a", "b")]
    assert abs(big["est_union"] - 1_000_000) / 1_000_000 < 0.5, tuple(big)
    assert abs(big["est_intersection"] - 200_000) / 200_000 < 0.6, tuple(big)
    # planted differences: a\b = 400k (ids 0..399999), b\a = 400k
    assert abs(big["est_a_minus_b"] - 400_000) / 400_000 < 0.6, tuple(big)
    assert abs(big["est_b_minus_a"] - 400_000) / 400_000 < 0.6, tuple(big)

    # PageRank on a planted 100k-node hub graph: 1000 hubs, each the
    # center of a 99-leaf star (leaves point only at their hub, hubs
    # chain hub -> next hub so mass circulates among hubs and never
    # returns to a leaf). Ground truth is a total order, not a timing:
    # every leaf's rank is EXACTLY the teleport floor (no in-edges),
    # every hub collects 99 leaf contributions and must out-rank every
    # leaf; floor-division-only arithmetic can lose mass, never mint it.
    from flink_kafka_spark.operators.graph import pagerank

    n_nodes = 100_000
    pr_unit = 1_000_000_000
    teleport_floor = 15 * (pr_unit // n_nodes) // 100
    hubs = spark.range(n_nodes).filter(F.pmod("id", F.lit(100)) == 0)
    leaves = spark.range(n_nodes).filter(F.pmod("id", F.lit(100)) != 0)
    hub_of = (F.col("id") - F.pmod("id", F.lit(100))).alias("hub")
    pr_edges = (
        leaves.select(F.col("id").alias("src"), hub_of.alias("dst"), F.lit(1).alias("w"))
        .unionByName(
            hubs.select(
                F.col("id").alias("src"),
                F.pmod(F.col("id") + 100, F.lit(n_nodes)).alias("dst"),
                F.lit(1).alias("w"),
            )
        )
    )
    pr_nodes = spark.range(n_nodes).select(F.col("id"))
    t0 = time.perf_counter()
    pr = pagerank(pr_edges, pr_nodes, "id", iterations=12)
    is_hub = F.pmod("node", F.lit(100)) == 0
    stats = pr.select(
        F.min(F.when(is_hub, F.col("rank_e9"))).alias("hub_min"),
        F.max(F.when(~is_hub, F.col("rank_e9"))).alias("leaf_max"),
        F.min(F.when(~is_hub, F.col("rank_e9"))).alias("leaf_min"),
        F.sum("rank_e9").alias("mass"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    timings[f"pagerank_{n_nodes}"] = round(time.perf_counter() - t0, 2)
    assert stats.n == n_nodes
    assert stats.leaf_min == stats.leaf_max == teleport_floor, tuple(stats)
    assert stats.hub_min > stats.leaf_max, (stats.hub_min, stats.leaf_max)
    assert stats.mass <= pr_unit, stats.mass

    # MMR over a 200-query batch against a 100k x 64 corpus (fresh
    # pseudo-random directions): the greedy is per-query-parallel, so
    # wall time should track the brute-force candidate stage, not
    # k x Q.
    from flink_kafka_spark.operators.similarity import mmr_rerank

    n_mmr_vecs = 100_000
    vecs = spark.range(n_mmr_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j -> CAST(pmod(xxhash64(concat(CAST(id AS STRING), "
            "'|', CAST(j AS STRING))), 1000) AS FLOAT) / 1000.0 - 0.5)"
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    mmr_rows = mmr_rerank(
        vecs.filter(F.col("vec_id") < 200), vecs, k=8, n_candidates=40
    ).count()
    timings[f"mmr_rerank_200x{n_mmr_vecs}"] = round(time.perf_counter() - t0, 2)
    assert mmr_rows == 200 * 8, mmr_rows

    # bigram LM on a corpus with planted word-order structure: fluent
    # docs walk a fixed 500-token cycle (every transition deterministic
    # -> near-probability-1 under the model), every 10th doc reverses
    # alternate halves (same token bag, broken transitions). The probe
    # asserts PERFECT SEPARATION — every scrambled doc scores above
    # every fluent doc — which is exactly the signal the unigram
    # operator cannot produce (identical bags score identically there).
    from flink_kafka_spark.operators.text import bigram_logprob

    n_lm = 2 * n_docs
    fluent_words = F.expr(
        "transform(sequence(0, 39), i -> concat('w', pmod(id + i, 500)))"
    )
    # perfect-shuffle permutation of the SAME 40 offsets (evens take
    # 0..19, odds take 20..39): identical token bag, every transition
    # a ±20-ish jump the fluent corpus never makes
    scrambled_words = F.expr(
        "transform(sequence(0, 39), i -> concat('w', pmod(id + "
        "CASE WHEN pmod(i, 2) = 0 THEN CAST(floor(i / 2) AS INT) "
        "ELSE 20 + CAST(floor((i - 1) / 2) AS INT) END, 500)))"
    )
    lm_docs = spark.range(n_lm).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.when(F.pmod("id", F.lit(10)) == 9, scrambled_words).otherwise(fluent_words)
        ).alias("text"),
    )
    t0 = time.perf_counter()
    sep = (
        bigram_logprob(lm_docs)
        .select(
            F.min(
                F.when(F.pmod("doc_id", F.lit(10)) == 9, F.col("avg_neg_logprob"))
            ).alias("min_scrambled"),
            F.max(
                F.when(F.pmod("doc_id", F.lit(10)) != 9, F.col("avg_neg_logprob"))
            ).alias("max_fluent"),
        )
        .collect()[0]
    )
    timings[f"bigram_logprob_{n_lm}"] = round(time.perf_counter() - t0, 2)
    assert sep.min_scrambled > sep.max_fluent, tuple(sep)

    # hashed classifier + vocab audit over the same 100k corpus. The
    # classifier probe asserts the integer-exact contract holds at
    # scale (scores in (0,1), every doc scored); the vocab probe has
    # exact ground truth — the synthetic vocabulary is exactly w0..w499,
    # so against vocab_size=500 every 7th doc's planted unique token is
    # the ONLY out-of-vocabulary occurrence in the corpus.
    from flink_kafka_spark.operators.text import classifier_score, vocab_coverage

    t0 = time.perf_counter()
    clf = classifier_score(lm_docs).agg(
        F.count("*").alias("n"),
        F.min("clf_score").alias("lo"),
        F.max("clf_score").alias("hi"),
    ).collect()[0]
    timings[f"classifier_score_{n_lm}"] = round(time.perf_counter() - t0, 2)
    assert clf.n == n_lm and 0.0 < clf.lo <= clf.hi < 1.0, tuple(clf)

    oov_docs = lm_docs.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(7)) == 0,
            F.concat("text", F.lit(" zqx"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t0 = time.perf_counter()
    oov = vocab_coverage(oov_docs, vocab_size=500).agg(
        F.sum("n_oov").alias("total_oov"),
        F.sum((F.col("n_oov") > 0).cast("int")).alias("docs_with_oov"),
    ).collect()[0]
    timings[f"vocab_coverage_{n_lm}"] = round(time.perf_counter() - t0, 2)
    n_planted = (n_lm + 6) // 7
    assert (oov.total_oov, oov.docs_with_oov) == (n_planted, n_planted), tuple(oov)

    # blocked fuzzy linkage at 200k rows / 100k blocks: each block
    # holds exactly one planted pair one edit apart ('mk one' vs
    # 'mk ones'), so the exact pair set is known — n/2 pairs, every
    # distance 1, zero cross-block leakage.
    from flink_kafka_spark.operators.joins import fuzzy_match_pairs

    n_link = 200_000
    catalog = spark.range(n_link).select(
        F.col("id").alias("rec_id"),
        F.concat(
            F.lit("prod"),
            F.floor(F.col("id") / 2).cast("string"),
            F.when(F.pmod("id", F.lit(2)) == 0, F.lit(" mk one")).otherwise(
                F.lit(" mk ones")
            ),
        ).alias("name"),
    )
    t0 = time.perf_counter()
    linked = fuzzy_match_pairs(catalog, "rec_id", "name", max_dist=2).agg(
        F.count("*").alias("n"), F.max("lev_dist").alias("dmax")
    ).collect()[0]
    timings[f"fuzzy_link_{n_link}"] = round(time.perf_counter() - t0, 2)
    assert (linked.n, linked.dmax) == (n_link // 2, 1), tuple(linked)

    # the full no-model compose path at corpus scale: text -> hashed
    # embeddings -> SRP blocking -> blocked cosine pairs. The planted
    # near-dup pairs (every 10th doc duplicating its decade's seed
    # doc) have IDENTICAL token bags, so their hashed embeddings are
    # bit-identical (integer sums), land in the same SRP bucket by
    # construction, and must come back at cosine 1.0 — while two
    # random 40-token draws from a 500-token vocabulary share far too
    # little to cross 0.95. Exact pair-set recovery, composed from
    # three operators that have never seen each other's internals.
    from flink_kafka_spark.operators.dedup import embedding_cosine_pairs
    from flink_kafka_spark.operators.similarity import srp_bucket
    from flink_kafka_spark.operators.text import hashed_doc_embedding_vec

    t0 = time.perf_counter()
    hashed = hashed_doc_embedding_vec(docs, dim=64)
    # persist the embedded+blocked corpus (the doc_semantic_pairs
    # production pattern): the pair join consumes it on both sides,
    # and without this each side replays the full embedder pipeline.
    # 12 planes (4096 buckets), not the query's 8: bucket granularity
    # is THE quadratic-term lever — 256 buckets over 100k docs means
    # ~390-doc blocks and ~20M cosine pairs (~55 s measured), 4096
    # buckets ~24-doc blocks and ~1M pairs. Identical-embedding
    # planted pairs collide at any plane count, so the exact-recovery
    # assertion is granularity-independent.
    blocked = srp_bucket(hashed, "doc_id", "embedding", n_planes=12).persist()
    emb_pairs = embedding_cosine_pairs(
        blocked, "doc_id", "v", block_col="bucket", threshold=0.95
    )
    pair_stats = emb_pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                (F.pmod("id_a", F.lit(10)) == 1)
                & (F.col("id_b") == F.col("id_a") + 8)
                & (F.col("cosine") == 1.0)
            ).cast("int")
        ).alias("n_planted"),
    ).collect()[0]
    timings[f"hashed_embed_dedup_{n_docs}"] = round(time.perf_counter() - t0, 2)
    blocked.unpersist()
    assert pair_stats.n == pair_stats.n_planted == n_docs // 10, tuple(pair_stats)

    # PSI drift at the event scale: one event type's value distribution
    # jumps between stream halves (planted), the rest are stationary by
    # construction — the planted type must clear the 0.25 alarm line
    # and every stationary type must sit under 0.01.
    from flink_kafka_spark.queries.analytics import value_drift_psi as _psi_q
    import tempfile as _tf

    drift_ev = synth_events(spark, n_events).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.when(
            (F.col("event_type") == "error")
            & (F.unix_timestamp("ts") >= F.lit(1_700_000_000 + 302_400)),
            F.lit(450.0) + F.pmod(F.xxhash64("event_id"), F.lit(50)).cast("double"),
        )
        .otherwise(F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(100)).cast("double"))
        .alias("value"),
        F.lit("").alias("props"),
    )
    with _tf.TemporaryDirectory() as td:
        drift_ev.write.mode("overwrite").parquet(f"{td}/events.parquet")
        t0 = time.perf_counter()
        psi_rows = {r.event_type: r.psi for r in _psi_q(spark, td).collect()}
        timings[f"value_drift_psi_{n_events}"] = round(time.perf_counter() - t0, 2)
    assert psi_rows["error"] > 0.25, psi_rows
    assert all(v < 0.01 for t, v in psi_rows.items() if t != "error"), psi_rows

    # streaming stateful ops (round-2 vectorization evidence): per-key
    # Arrow frames of thousands of rows exercise the numpy batch scans
    # that replaced the per-row iterrows() loops — the round-1 scale
    # bottleneck. File replay -> applyInPandasWithState -> noop sink.
    n_stream = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    import tempfile

    from flink_kafka_spark.schemas import AD_CLICK, LOGIN_EVENT
    from flink_kafka_spark.streaming.sources import csv_replay_source
    from flink_kafka_spark.streaming.stateful import blacklist_stream, login_fail_stream

    def run_stream(df, ckpt):
        q = (
            df.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)

    with tempfile.TemporaryDirectory() as tmp:
        login_src = os.path.join(tmp, "login")
        spark.range(n_stream).select(
            F.concat_ws(
                ",",
                F.pmod(F.col("id"), F.lit(200)).cast("string"),
                F.lit("ip"),
                F.when(F.pmod(F.xxhash64("id"), F.lit(4)) == 0, "success").otherwise("fail"),
                (F.lit(1_700_000_000) + (F.col("id") / 200).cast("long")).cast("string"),
            ).alias("value")
        ).coalesce(4).write.mode("overwrite").text(login_src)
        t0 = time.perf_counter()
        stream = csv_replay_source(spark, login_src, LOGIN_EVENT).withWatermark(
            "ts", "1 second"
        )
        run_stream(login_fail_stream(stream, max_gap_s=2), os.path.join(tmp, "ck1"))
        timings[f"login_fail_stream_{n_stream}"] = round(time.perf_counter() - t0, 2)

        click_src = os.path.join(tmp, "clicks")
        spark.range(n_stream).select(
            F.concat_ws(
                ",",
                F.pmod(F.col("id"), F.lit(100)).cast("string"),
                F.pmod(F.col("id"), F.lit(10)).cast("string"),
                F.lit("p"),
                F.lit("c"),
                (F.lit(1_700_000_000) + (F.col("id") / 1000).cast("long")).cast("string"),
            ).alias("value")
        ).coalesce(4).write.mode("overwrite").text(click_src)
        t0 = time.perf_counter()
        clicks = csv_replay_source(spark, click_src, AD_CLICK).withWatermark(
            "ts", "1 second"
        )
        run_stream(blacklist_stream(clicks, threshold=100), os.path.join(tmp, "ck2"))
        timings[f"blacklist_stream_{n_stream}"] = round(time.perf_counter() - t0, 2)

        # sequence_match_stream timer-arming probe (round-4 verdict #3):
        # n_seq keys each hold ONE live chain while ~40 filler-only
        # micro-batches advance the watermark. Timers armed at the
        # earliest actionable instant mean those batches fire NO keys
        # (nothing is actionable until the success events land); the
        # old watermark+1s arming re-fired every live key every batch —
        # O(keys x batches) state-function invocations. The wall time
        # of the filler phase is the observable.
        n_seq = 10_000
        base = 1_700_000_000
        seq_src = os.path.join(tmp, "seq")
        os.makedirs(seq_src)

        def write_file(name: str, lines: list[str], order: int) -> None:
            p = os.path.join(seq_src, name)
            with open(p, "w") as f:
                f.write("\n".join(lines) + "\n")
            os.utime(p, (1_000_000 + order, 1_000_000 + order))  # replay order

        write_file("b000.csv", [f"{u},ip,fail,{base}" for u in range(n_seq)], 0)
        for i in range(40):  # one sentinel line per file -> one batch each
            write_file(f"b{i + 1:03d}.csv", [f"999999,ip,success,{base + 100 + i * 10}"], i + 1)
        write_file(
            "b998.csv", [f"{u},ip,success,{base + 600}" for u in range(n_seq)], 98
        )
        # trailing sentinel: watermark past the successes
        write_file("b999.csv", [f"999999,ip,success,{base + 5000}"], 99)
        from flink_kafka_spark.streaming.stateful import sequence_match_stream

        t0 = time.perf_counter()
        seq_stream = csv_replay_source(
            spark, seq_src, LOGIN_EVENT, max_files_per_trigger=1
        ).withWatermark("ts", "1 second")
        matches = sequence_match_stream(
            seq_stream, "user_id", "ts",
            [("fail", "login_state = 'fail'"), ("ok", "login_state = 'success'")],
            within_s=3600,
        )
        q = (
            matches.writeStream.outputMode("append").format("memory")
            .queryName("seq_stress").option("checkpointLocation", os.path.join(tmp, "ck3"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(600)
        timings[f"sequence_match_stream_{n_seq}x42"] = round(time.perf_counter() - t0, 2)
        n_matches = spark.sql("SELECT count(*) c FROM seq_stress").collect()[0].c
        assert n_matches == n_seq, n_matches

    # --- grid resample + ffill: grid is resolution-bounded, not
    # corpus-bounded. 10M events collapse onto 1000 keys x 1-min
    # buckets over the week (~10.08M grid rows — deliberately the
    # same order as the input, the worst honest ratio for this
    # operator). Ground truth: natural key 0 is removed and replanted
    # as a SINGLE observation (value 42) at the stream's first instant
    # — its entire remaining grid must come back 0-count with 42.0
    # carried forward and a gap that grows to the full week (~10k
    # buckets), probing the ffill window across a maximal gap.
    from flink_kafka_spark.operators.timeseries import resample_ffill

    t0 = time.perf_counter()
    planted = spark.range(1).select(
        F.lit(0).cast("long").alias("gkey"),
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
        F.lit(42.0).alias("gv"),
    )
    tev = ev.select(
        F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(1000)).alias("gkey"),
        "ts",
        (F.pmod(F.xxhash64("event_id", F.lit(8)), F.lit(1000)) / 100.0).alias("gv"),
    ).filter(F.col("gkey") != 0).unionByName(planted)
    grid = resample_ffill(tev, "gkey", "ts", "gv", 60)
    agg = grid.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("gkey") == 0, 1).otherwise(0)).alias("k0_rows"),
        F.sum(F.when((F.col("gkey") == 0) & (F.col("cnt") == 0), 1).otherwise(0)).alias("k0_empty"),
        F.max(F.when(F.col("gkey") == 0, F.col("gap_buckets"))).alias("k0_gap"),
        F.min(F.when((F.col("gkey") == 0) & (F.col("cnt") == 0), F.col("filled_avg"))).alias("k0_fill_min"),
        F.max(F.when((F.col("gkey") == 0) & (F.col("cnt") == 0), F.col("filled_avg"))).alias("k0_fill_max"),
    ).collect()[0]
    timings[f"resample_ffill_{n_events}"] = round(time.perf_counter() - t0, 2)
    # the planted observation sits in the global FIRST bucket, so key
    # 0's grid = 1 observed + (n_buckets - 1) empty, gap peaking at
    # n_buckets - 1, and the carried mean is exactly 42.0 throughout.
    # Bucket count comes from key 0's own rows; rows = keys_present x
    # buckets always, and all 1000 hash keys materialize only at the
    # default event volume (smaller CLI inputs may miss some)
    n_buckets = agg["k0_rows"]
    assert n_buckets > 0 and agg["rows"] % n_buckets == 0, (agg["rows"], n_buckets)
    if n_events >= 10_000_000:
        assert agg["rows"] == n_buckets * 1000, agg["rows"]
    assert agg["k0_empty"] == n_buckets - 1
    assert agg["k0_gap"] == n_buckets - 1, agg["k0_gap"]
    assert agg["k0_fill_min"] == agg["k0_fill_max"] == 42.0

    # z-order locality at 10M rows over a known 4096 x 2048 grid: the
    # key is a pure codegen expression against broadcast bounds, so
    # wall time must track the scan, and the geometry is exact — 64
    # buckets over 12+11 interleaved bits carve tiles bounded by
    # 512 x 512 (z-curve runs, not perfect squares, but each bucket's
    # extent is <= 2 tiles per dim); the 1-D baseline's second dim
    # would span the full 2048.
    from flink_kafka_spark.operators.layout import zorder_locality

    zdf = spark.range(n_events).select(
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(4096)).alias("zx"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(2048)).alias("zy"),
    )
    t0 = time.perf_counter()
    zrows = zorder_locality(zdf, ["zx", "zy"], bits=12, n_buckets=64).collect()
    timings[f"zorder_locality_{n_events}"] = round(time.perf_counter() - t0, 2)
    assert sum(r["n_rows"] for r in zrows) == n_events
    for r in zrows:
        assert r["max_zx"] - r["min_zx"] <= 1024, dict(r.asDict())
        assert r["max_zy"] - r["min_zy"] <= 1024, dict(r.asDict())

    # t-closeness mega-class probe: one quasi class carries 90% of a
    # 10M-row audit (the boilerplate-source shape the docstring's skew
    # claim is about: nothing after the (class, value) cell agg is
    # row-bounded — cells here are 101 classes x 32 values, so the wall
    # must track the one scan+shuffle). Geometry is exact: ids arrive
    # in blocks of 32 consecutive values, every block contributing one
    # full uniform pass over the value domain to its class, so EVERY
    # class's distribution equals the global uniform and both distances
    # are exactly 0.0 for all 101 classes — keep-all, bit-exact.
    from flink_kafka_spark.operators.sampling import t_closeness

    n_tc = n_events - (n_events % 320)
    if n_tc:
        blk = F.floor(F.col("id") / 32)
        tdf = spark.range(n_tc).select(
            F.when(F.pmod(blk, 10) < 9, F.lit("mega"))
            .otherwise(
                F.concat(F.lit("c"), F.pmod(F.floor(blk / 10), 100).cast("string"))
            )
            .alias("q"),
            F.pmod("id", F.lit(32)).alias("v"),
        )
        t0 = time.perf_counter()
        trows = t_closeness(tdf, ["q"], "v", t=0.2).collect()
        timings[f"t_closeness_skew_{n_events}"] = round(time.perf_counter() - t0, 2)
        # expected geometry from n_tc alone (n_tc % 320 == 0, so the
        # block count divides by 10): mega + min(blocks/10, 100) tail
        # classes at the default 10M this is the 101 the docstring
        # describes; smaller CLI n_events scale down, never misfire
        n_blocks = n_tc // 32
        n_classes = 1 + min(n_blocks // 10, 100)
        assert len(trows) == n_classes, (len(trows), n_classes)
        assert sum(r["class_size"] for r in trows) == n_tc
        mega = next(r for r in trows if r["q"] == "mega")
        assert mega["class_size"] == n_tc * 9 // 10, mega["class_size"]
        assert all(
            r["t_tvd"] == 0.0 and r["t_emd"] == 0.0 and r["keep"] == 1
            for r in trows
        ), [r for r in trows if r["keep"] != 1][:3]

    # media perceptual-hash dedup at the full doc count: 128-byte
    # pseudo-random payloads, doc 10k+9 a VERBATIM byte copy of doc
    # 10k+1 — so exactly n/10 Hamming-0 pairs are planted, and a
    # random cross-pair needs a 64-bit hash within Hamming 3 of
    # another (P ~ 2.4e-15/pair: unreachable at ~1e9 pairs). The
    # probe therefore asserts the EXACT pair set, which exercises
    # both pigeonhole completeness (no planted pair missed) and
    # bucket precision (no phantom pair) at scale; the timing's
    # subject is the single payload-hash pass + chunk-bucket join.
    from flink_kafka_spark.operators.multimodal import phash_pairs

    t0 = time.perf_counter()
    media = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.encode(
            F.expr(
                "concat_ws('', transform(sequence(0, 127), c -> "
                "char(32 + pmod(xxhash64(id - CASE WHEN pmod(id, 10) = 9 "
                "THEN 8 ELSE 0 END, c), 95))))"
            ),
            "UTF-8",
        ).alias("payload"),
    )
    # one execution for both numbers: only the signature table is
    # persisted inside phash_pairs, so a second action would re-run
    # the chunk-bucket join and double the recorded wall
    ph_stats = phash_pairs(media, max_hamming=3).agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            (
                ~F.expr("pmod(id_a, 10) = 1 AND id_b = id_a + 8 AND hamming = 0")
            ).cast("int")
        ).alias("bad"),
    ).collect()[0]
    timings[f"media_phash_dedup_{n_docs}"] = round(time.perf_counter() - t0, 2)
    assert (ph_stats.bad or 0) == 0 and ph_stats.n_pairs == n_docs // 10, tuple(ph_stats)

    print(
        json.dumps(
            {
                "metric": "stress timings",
                "unit": "sec",
                "n_events": n_events,
                "n_docs": n_docs,
                "n_stream": n_stream,
                "near_dup_pairs": n_pairs,
                "timings": timings,
            }
        )
    )


def _build_scaled_dir(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    """Materialize a ~``replicas``x scale factor from ``src_dir`` as
    REPLICA SHARDS: every replica (including the first) gets disjoint
    ids and a disjoint token space, so within-shard structure (dup
    rate, block sizes, bucket fan-out) is identical to the source and
    CROSS-shard candidates are zero — the honest scaling model for a
    corpus that grew 3x, as opposed to self-union (which triples every
    LSH bucket in place and makes ANY pair generator look quadratic).
    Only the tables the curve queries read are replicated; the rest
    copy through once."""
    from flink_kafka_spark.tables import TABLES, load

    def replicate(name, transform):
        parts = [
            transform(load(spark, src_dir, name), rep, F.lit(rep * 100_000_000).cast("long"))
            for rep in range(replicas)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    # every token SUFFIXED with the shard tag: token counts, lengths,
    # within-shard dup structure AND first-character distributions
    # preserved (a prefix would collapse every blocking key built on a
    # token's initial — the first curve run did exactly that to
    # fuzzy_part_matches' second-initial component and manufactured a
    # quadratic the real operator doesn't have); vocabularies disjoint
    def docs_t(df, rep, off):
        text = F.concat_ws(
            " ",
            F.transform(
                F.split("text", " "), lambda t: F.concat(t, F.lit(f"s{rep}"))
            ),
        )
        return df.select(
            (F.col("doc_id") + off).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).alias("n_chars"),
        )

    def part_t(df, rep, off):
        name = F.concat_ws(
            " ",
            F.transform(
                F.split("p_name", " "), lambda t: F.concat(t, F.lit(f"s{rep}"))
            ),
        )
        return df.select(
            (F.col("p_partkey") + off).alias("p_partkey"),
            name.alias("p_name"),
            "p_brand", "p_type", "p_size", "p_retailprice",
        )

    def events_t(df, rep, off):
        return df.select(
            (F.col("event_id") + off).alias("event_id"),
            "ts",
            (F.col("user_id") + off).alias("user_id"),
            "event_type", "value", "props",
        )

    # keys offset, quasi/sensitive columns untouched: class sizes and
    # the global histogram scale together, so t-closeness DISTANCES are
    # replica-invariant while the audited row volume grows honestly
    def customer_t(df, rep, off):
        return df.withColumn("c_custkey", (F.col("c_custkey") + off).cast("long"))

    replicate("documents", docs_t)
    replicate("part", part_t)
    replicate("events", events_t)
    replicate("customer", customer_t)
    for name in TABLES:
        if name in ("documents", "part", "events", "customer"):
            continue
        load(spark, src_dir, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )


CURVE_QUERIES = (
    "multi_query_search",
    "dedup_canonicalize",
    "fuzzy_part_matches",
    "training_mix_snapshot",
    "events_gapfill",
    # r10 verdict item 4: the three biggest new walls — iterative
    # (trainer argmax / fixed-point rounds) and threshold-prefiltered
    # operators whose linearity was argued from plans, now measured
    "bpe_tokenize_stats",
    "source_pagerank",
    "kmv_set_cardinality",
    # r12 verdict item 6: the two r13 registrations — pair cost must
    # stay sketch-sized (flat in corpus growth) and the KLL rollup is
    # two map-side-combined sketch shuffles (linear scan term only)
    "kmv_pair_intersections",
    "kll_quantile_rollup",
    # r14 registrations: the t-closeness distance machinery (and its
    # embedded reuse inside the release funnel) must stay cell-framed —
    # everything past the one corpus shuffle is |classes|x|values|
    # rows, so walls should be flat in corpus growth
    "t_closeness_audit",
    "release_gate_snapshot",
    # r15 registrations: the media perceptual-hash family — one
    # payload-hash pass + chunk-bucket pair join (and, incremental,
    # the cross-corpus bucket join against the half-corpus reference)
    # must scale with the corpus scan, never with candidate pairs
    "media_phash_dedup",
    "media_phash_incremental",
    # r16 registrations: winnowing is a zero-shuffle per-row array
    # pipeline (wall must track the scan, alpha ~1) and the overlap
    # detector's bucket fan-out is stop_df-bounded, so pair cost must
    # not go quadratic as replicas multiply within-bucket doc counts
    "doc_winnow_fingerprint",
    "winnow_overlap_pairs",
    # r17 registration: decontamination fingerprints both sides and
    # joins on the hash — the train side must track the scan and the
    # join stay eval-index-bounded (replica shards keep the eval
    # subset proportional, so matched pairs grow linearly, never
    # cross-shard)
    "winnow_decontaminate",
    # r17 registrations, curved before their r18 first hash (r17
    # verdict item 7 — the r16 quadratic was invisible until the
    # curve ran): span localization's islands window partitions over
    # MATCHED positions only (contamination-sized, proportional under
    # replica shards) and the trim's token filter is a per-row HOF —
    # both must track the corpus scan
    "winnow_contaminated_spans",
    "winnow_decontaminate_trim",
    # r18 registrations, curved before their r19 first hash (the same
    # pre-hash discipline): fusion frames are candidate-bounded (wall
    # should be scan-flat), the stride interleave is one rn shuffle +
    # the range-partition rank (log-factor at worst), and the
    # multi-benchmark detector must track the single detector's
    # train-side scan with the index contribution flat
    "hybrid_rrf_search",
    "source_interleave",
    "winnow_decontaminate_multi",
)
# wall(3x) / wall(1x) <= 3^ALPHA_MAX: linear is alpha=1; the margin
# absorbs shuffle/sort log factors and timing noise, while a quadratic
# stage (alpha=2 -> ratio 9) fails decisively.
ALPHA_MAX = 1.6


def curve_main() -> None:
    """Scaling-curve probe (r9 verdict item 6): run the curated
    CURVE_QUERIES wall set (top walls + plan-argued operators) at
    sf0.01, sf0.1 and a materialized
    ~sf0.3 (3 disjoint replica shards of sf0.1), and assert the
    sf0.1 -> sf0.3 wall-time exponent stays ~linear — the ground-truth
    check for hidden quadratics that plan audits cannot see.

    What the disjoint-shard model measures: ENGINE scaling at fixed
    workload density (same block sizes, bucket fan-outs and dup rates
    per shard). It deliberately does NOT model a catalog whose
    vocabulary stays fixed while rows triple — there a blocked
    self-join's candidates grow quadratically BY DESIGN, which is the
    operator's documented intrinsic cost (measured by main()'s
    hot-block probe), not a hidden defect this probe should page on.

    Usage: python tools/stress.py --curve [replicas]
    """
    import math
    import tempfile

    from flink_kafka_spark.caching import release_all
    from flink_kafka_spark.queries import all_queries

    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="stress_curve")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def timed(name, sf_dir):
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_all()
        spark.catalog.clearCache()
        return round(time.perf_counter() - t0, 2)

    results: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as td:
        scaled = os.path.join(td, f"sf0.1x{replicas}")
        t0 = time.perf_counter()
        _build_scaled_dir(spark, "/root/testdata/sf0.1", scaled, replicas)
        build_s = round(time.perf_counter() - t0, 2)
        # warm each query shape once (codegen/reader init) — r9 lesson:
        # never time a session's first execution of a plan
        for name in CURVE_QUERIES:
            qs[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
            release_all()
            spark.catalog.clearCache()
        failures = []
        for name in CURVE_QUERIES:
            t001 = timed(name, "/root/testdata/sf0.01")
            t01 = timed(name, "/root/testdata/sf0.1")
            t03 = timed(name, scaled)
            # noise floor: exponents on sub-second walls are meaningless
            alpha = math.log(t03 / max(t01, 0.5)) / math.log(replicas)
            results[name] = {
                "sf0.01": t001, "sf0.1": t01, f"sf0.1x{replicas}": t03,
                "alpha": round(alpha, 2),
            }
            if alpha > ALPHA_MAX:
                failures.append(f"{name}: alpha={alpha:.2f} (>{ALPHA_MAX})")
    print(
        json.dumps(
            {
                "metric": "scaling-curve exponents",
                "replicas": replicas,
                "build_s": build_s,
                "alpha_max": ALPHA_MAX,
                "queries": results,
            }
        )
    )
    assert not failures, "superlinear scaling: " + "; ".join(failures)


if __name__ == "__main__":
    if "--curve" in sys.argv:
        curve_main()
    else:
        main()
