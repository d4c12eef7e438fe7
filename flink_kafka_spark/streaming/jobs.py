"""Watermarked streaming jobs: the reference's windowed pipelines in
streaming mode, composed from the SAME batch operators
(flink_kafka_spark.operators) plus ``withWatermark``.

Watermark policy mirrors SURVEY.md §2.6: the reference mostly uses
ascending-timestamp (0-delay) watermarks (W7) and 1-3 s bounded
out-of-orderness (W8); ``allowedLateness`` + late side output (W9) has
no exact Spark analog — `update` output mode re-emits corrected window
aggregates while the watermark holds the window open, which covers the
reference's in-lateness updates; truly-late capture is a downstream
filter against the observed watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.topn import topn_counts_per_window
from ..operators.windows import windowed_count, windowed_distinct


def hot_items_stream(user_behavior: DataFrame, delay: str = "1 second") -> DataFrame:
    """HotItems.java:75-79: filter pv → per-item sliding 1h/5min count.
    Ranking (R1) happens per micro-batch via `rank_hot_items` in a
    foreachBatch sink — Top-N needs the window's rows together, which
    streaming append mode can't give until the window closes."""
    return windowed_count(
        user_behavior.withWatermark("ts", delay).filter(F.col("behavior") == "pv"),
        "ts",
        "1 hour",
        "5 minutes",
        keys=["item_id"],
    )


def rank_hot_items(counts_batch: DataFrame, n: int = 5) -> DataFrame:
    """R1 finisher for foreachBatch: Top-N items per closed window."""
    return topn_counts_per_window(counts_batch, "item_id", n)


def page_view_stream(user_behavior: DataFrame, delay: str = "1 second") -> DataFrame:
    """PageView.java:59-70: pv filter → tumbling 1h global count."""
    return windowed_count(
        user_behavior.withWatermark("ts", delay).filter(F.col("behavior") == "pv"),
        "ts",
        "1 hour",
    )


def unique_visitor_stream(
    user_behavior: DataFrame, delay: str = "1 second", approximate: bool = False
) -> DataFrame:
    """UniqueVisitor.java:53-56 (exact) / UvWithBloomFilter.java:56-60
    (approx — HLL++ replaces the Redis bitmap Bloom filter).

    Streaming forbids COUNT(DISTINCT), so the exact path is the
    dedup-then-count chain: dropDuplicates on (window, user) — state
    evicted by the watermark through the window's event-time column —
    feeding a plain windowed count (multi-stateful-operator query).
    The approx path is a normal mergeable HLL++ aggregation."""
    pv = user_behavior.withWatermark("ts", delay).filter(F.col("behavior") == "pv")
    if approximate:
        return windowed_distinct(pv, "ts", "1 hour", "user_id", approximate=True)
    deduped = pv.select(
        F.window("ts", "1 hour").alias("_w"), F.col("user_id")
    ).dropDuplicates(["_w", "user_id"])
    return (
        deduped.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("uv"))
        .select(
            F.col("_w.start").cast("long").alias("window_start_s"),
            F.col("_w.end").cast("long").alias("window_end_s"),
            "uv",
        )
    )


def channel_stats_stream(marketing: DataFrame, delay: str = "1 second") -> DataFrame:
    """AppMarketingByChannel.java:48-52: drop UNINSTALL → per
    channel×behavior sliding 1h/5s count."""
    return windowed_count(
        marketing.withWatermark("ts", delay).filter(F.col("behavior") != "UNINSTALL"),
        "ts",
        "1 hour",
        "5 seconds",
        keys=["channel", "behavior"],
    )


def hot_pages_stream(apache_log: DataFrame, delay: str = "1 minute") -> DataFrame:
    """HotPages.java:68-79: GET + static-resource regex filter →
    per-url sliding 10min/5s count. The reference's allowedLateness(1m)
    maps to the 1-minute watermark delay here (update-mode re-emission
    replaces late re-fires — W9 note in module docstring)."""
    filtered = (
        apache_log.withWatermark("ts", delay)
        .filter(F.col("method") == "GET")
        .filter(~F.col("url").rlike(r"\.(css|js|png|ico)$"))
    )
    return windowed_count(filtered, "ts", "10 minutes", "5 seconds", keys=["url"])


def dedup_stream(
    events: DataFrame, id_cols: list[str] | None = None, delay: str = "1 hour"
) -> DataFrame:
    """Exact streaming deduplication with watermark-bounded state
    (training-data-pipeline extension; the reference's motivation for
    its Redis-bitmap Bloom filter, UvWithBloomFilter.java:95-155 —
    Spark's dedup state is per-key-hash in the state store and the
    watermark evicts keys older than ``delay``, so memory is bounded
    without an external store)."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        id_cols or ["user_id"]
    )


def incremental_dedup_stream(
    docs_stream: DataFrame,
    reference: DataFrame,
    sink,
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    ref_index: "DataFrame | None" = None,
):
    """NEAR-dup-filter an incoming document stream against a static
    reference corpus (the streaming face of
    operators.dedup.incremental_dedup: dedup tonight's crawl feed
    against the corpus you already trained on, as it arrives). Exact
    per-key dedup is :func:`dedup_stream`; this catches the
    high-Jaccard rewordings exact keys miss.

    MinHash/LSH verification needs per-batch aggregation + self-scoped
    persists, so the operator runs under ``foreachBatch`` — full batch
    semantics per micro-batch — with each batch's internal persists
    released as soon as its sink materializes (caching.release_scope),
    so a long-running query holds no growing block-store state. The
    reference index is built ONCE outside the loop (pass a stored
    ``build_dedup_index`` frame — ideally bucketed on (band,
    band_hash), see io.write_bucketed — so each micro-batch shuffles
    only the batch side).

    ``sink(verdicts_df, epoch_id)`` receives the is_novel verdict
    frame per batch. Returns the configured ``DataStreamWriter`` —
    caller sets trigger/checkpoint and ``.start()``s it.
    """
    from ..caching import release_scope
    from ..operators.dedup import build_dedup_index, incremental_dedup

    if ref_index is None:
        # persist + materialize BEFORE the loop: build_dedup_index is
        # lazy, and an unpersisted index re-tokenizes and re-MinHashes
        # the ENTIRE reference corpus inside every micro-batch's
        # action — N batches = N full reference passes. Plain persist
        # (not caching.track): the index must live for the query's
        # lifetime, not until the next registered-query boundary.
        ref_index = build_dedup_index(reference, id_col, n, k, bands).persist()
        ref_index.count()

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            verdicts = incremental_dedup(
                batch_df, reference, id_col, n, k, bands, threshold, ref_index=ref_index
            )
            sink(verdicts, epoch_id)

    return docs_stream.writeStream.foreachBatch(_process)


def media_phash_stream(
    media_stream: DataFrame,
    reference: DataFrame,
    sink,
    max_hamming: int = 3,
    ref_sig: "DataFrame | None" = None,
):
    """Near-dup-filter an incoming MEDIA stream (doc_id, payload)
    against a static reference corpus by perceptual hash — the
    streaming face of operators.multimodal.phash_incremental, and the
    media twin of :func:`incremental_dedup_stream` (an image-crawl
    feed deduped against the training corpus as it arrives).

    The pair search needs per-batch aggregation + self-scoped
    persists, so the operator runs under ``foreachBatch`` with each
    batch's internal persists released as its sink materializes
    (caching.release_scope). The reference is hashed ONCE outside the
    loop (pass a stored :func:`perceptual_hash` frame — 5 ints/doc —
    as ``ref_sig``); each micro-batch then hashes and broadcasts only
    its own payloads' chunk buckets.

    ``sink(verdicts_df, epoch_id)`` receives the is_novel verdict
    frame per batch (one row per HASHABLE batch payload — the
    perceptual_hash >= PHASH_MIN_BYTES precondition). Returns the
    configured ``DataStreamWriter`` — caller sets trigger/checkpoint
    and ``.start()``s it.
    """
    from ..caching import release_scope
    from ..operators.multimodal import perceptual_hash, phash_incremental

    if ref_sig is None:
        # persist + materialize BEFORE the loop: lazy signatures would
        # re-decode and re-hash the ENTIRE reference corpus inside
        # every micro-batch's action. Plain persist (not
        # caching.track): the index must live for the query's
        # lifetime, not until the next registered-query boundary.
        ref_sig = perceptual_hash(reference).persist()
        ref_sig.count()

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            verdicts = phash_incremental(
                batch_df, reference, max_hamming, ref_sig=ref_sig
            )
            sink(verdicts, epoch_id)

    return media_stream.writeStream.foreachBatch(_process)


def winnow_decontaminate_stream(
    docs_stream: DataFrame,
    eval_df: "DataFrame | None",
    sink,
    eval_index: "DataFrame | None" = None,
    k: "int | None" = None,
    w: "int | None" = None,
):
    """Decontaminate an incoming DOCUMENT stream (doc_id, text)
    against a static eval/benchmark corpus by winnowing fingerprints —
    the streaming face of operators.text.winnow_decontaminate, and the
    text twin of :func:`media_phash_stream` (a crawl feed screened for
    benchmark leakage as it arrives, under the SIGMOD'03 w+k-1
    verbatim-run guarantee).

    Per-batch candidate aggregation + self-scoped persists →
    ``foreachBatch`` (the media twin's reasoning verbatim). The eval
    index is fingerprinted ONCE outside the loop — pass a stored
    :func:`~flink_kafka_spark.operators.text.winnow_eval_index` frame
    (distinct (eval_id, 40-bit fp_hash) pairs, benchmark-sized) as
    ``eval_index``; lazily built indexes would re-fingerprint the
    whole eval corpus inside every micro-batch's action, so the
    inline path persists + materializes before the loop (plain
    persist, not caching.track: the index outlives every
    registered-query boundary).

    ``sink(contaminated_df, epoch_id)`` receives the per-batch
    contamination frame (one row per CONTAMINATED batch doc — clean
    docs emit nothing; anti-join against the batch for the releasable
    stream). Returns the configured ``DataStreamWriter`` — caller sets
    trigger/checkpoint and ``.start()``s it.

    CACHE LIFECYCLE (r17 review finding): the inline eval_df path
    persists the index it builds for as long as the app runs — there
    is no automatic unpersist because the stream that needs it has no
    defined end. The handle is exposed as ``eval_index_handle`` on
    the returned writer; callers who need reclamation should either
    pass a stored ``eval_index`` (and own its lifecycle), or
    ``writer.eval_index_handle.unpersist()`` after the query
    terminates (``query.awaitTermination()`` / a
    ``StreamingQueryListener`` onQueryTerminated hook)."""
    from ..caching import release_scope
    from ..operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_decontaminate,
        winnow_eval_index,
    )

    # resolve against the batch operator's canonical widths so a
    # retune there moves BOTH faces together — a streaming face on
    # stale defaults would equality-join fingerprints computed with
    # different (k, w) and silently match nothing (r17 review finding)
    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w
    if eval_index is None:
        if eval_df is None:
            raise ValueError(
                "winnow_decontaminate_stream: pass eval_df or a stored eval_index"
            )
        eval_index = winnow_eval_index(eval_df, k=k, w=w).persist()
        eval_index.count()

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            flagged = winnow_decontaminate(
                batch_df, k=k, w=w, eval_index=eval_index
            )
            sink(flagged, epoch_id)

    writer = docs_stream.writeStream.foreachBatch(_process)
    # expose the (possibly internally persisted) index so the caller
    # can unpersist after query termination — see CACHE LIFECYCLE
    writer.eval_index_handle = eval_index
    return writer


def winnow_decontaminate_multi_stream(
    docs_stream: DataFrame,
    eval_index: DataFrame,
    sink,
    k: "int | None" = None,
    w: "int | None" = None,
):
    """Screen a document stream against MANY benchmarks at once — the
    streaming face of operators.text.winnow_decontaminate_multi, and
    the multi-benchmark sibling of :func:`winnow_decontaminate_stream`
    (same foreachBatch + release_scope discipline, same (k, w)
    resolution against the batch operator's canonical widths).

    ``eval_index`` MUST be a stored ``(bench_id, eval_id, fp_hash)``
    frame (union of per-benchmark winnow_eval_index frames, each
    tagged with a bench_id literal) — there is no inline path because
    the multi operator's whole point is that the benchmark suite is
    fingerprinted once per version while each micro-batch
    fingerprints only itself. The caller owns the index's persist
    lifecycle (the single stream's CACHE LIFECYCLE note applies).

    ``sink(hits_df, epoch_id)`` receives one row per (contaminated
    batch doc, benchmark hit) with the per-benchmark evidence
    columns; clean docs emit nothing."""
    from ..caching import release_scope
    from ..operators.text import WINNOW_K, WINNOW_W, winnow_decontaminate_multi

    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            hits = winnow_decontaminate_multi(batch_df, eval_index, k=k, w=w)
            sink(hits, epoch_id)

    return docs_stream.writeStream.foreachBatch(_process)


def bucket_partials_stream(
    events: DataFrame,
    key: str,
    value_col: str,
    step_s: int = 300,
    delay: str = "1 second",
) -> DataFrame:
    """Streaming half of the resample family: per-(key, tumbling
    ``step_s`` bucket) count / non-null count / e4-fixed-point sum,
    emitted on window close (append mode). Feed the closed buckets to
    :func:`emit_gapfill` in a foreachBatch sink — the same split the
    batch twin uses internally (operators.timeseries._grid_obs →
    densify), so the streaming face shares the batch operators'
    arithmetic exactly. One keyed shuffle; state = open buckets only,
    evicted by the watermark."""
    from ..operators.timeseries import _e4

    return (
        events.withWatermark("ts", delay)
        .groupBy(
            F.window("ts", f"{step_s} seconds").alias("_w"),
            F.col(key).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count(value_col).alias("vcnt"),
            F.sum(_e4(value_col)).alias("val_e4"),
        )
        .select(
            "key",
            F.col("_w.start").cast("long").alias("bucket_s"),
            "cnt",
            "vcnt",
            "val_e4",
        )
    )


def emit_gapfill(closed_buckets: DataFrame, key: str, step_s: int = 300) -> DataFrame:
    """foreachBatch finisher for :func:`bucket_partials_stream`:
    densify one micro-batch's CLOSED buckets onto the step grid over
    the batch's own bucket range (per-key zero-fill, forward-fill, gap
    distance) via the batch operator's densify half — batch twin:
    operators.timeseries.resample_ffill. Per-batch semantics: the
    forward-fill restarts at each micro-batch's first bucket; carrying
    state across batches is the stored rollup's job (append the
    emitted grids and re-densify over the seam when stitching)."""
    from ..operators.timeseries import densify_buckets

    return densify_buckets(
        closed_buckets.withColumnRenamed("key", key), key, step_s
    )


def session_stats_stream(
    events: DataFrame,
    key: str = "user_id",
    gap: str = "30 minutes",
    delay: str = "1 hour",
) -> DataFrame:
    """True streaming sessionization: ``session_window`` merges a key's
    events separated by less than ``gap`` into one growing window whose
    state the watermark closes (batch twin: the lag+cumsum 'sessionize'
    query — same semantics, ANSI-SQL-checkable). One shuffle on the
    session key."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("_w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("_w.start").cast("long").alias("session_start_s"),
            F.col("_w.end").cast("long").alias("session_end_s"),
            key,
            "n_events",
        )
    )


def tx_interval_join_stream(
    orders: DataFrame,
    receipts: DataFrame,
    lower_s: int = -3,
    upper_s: int = 5,
    delay: str = "10 seconds",
) -> DataFrame:
    """J1 as a true stream-stream join (TxPayMatchByJoin.java:63-80:
    receipt.ts ∈ [pay.ts-3s, pay.ts+5s] per tx_id): inner equi-join
    with a time-range residual. Watermarks on BOTH sides + the range
    condition bound the join state — each side's buffered rows are
    dropped once the other side's watermark passes the range, so state
    does not grow with the stream."""
    pays = (
        orders.filter(F.col("tx_id") != "")
        .withWatermark("ts", delay)
        .select(
            F.col("order_id"), F.col("tx_id"), F.col("ts").alias("pay_ts")
        )
    )
    rcpts = receipts.withWatermark("ts", delay).select(
        F.col("tx_id").alias("r_tx_id"),
        F.col("pay_channel"),
        F.col("ts").alias("receipt_ts"),
    )
    return pays.join(
        rcpts,
        F.expr(
            f"tx_id = r_tx_id AND receipt_ts BETWEEN pay_ts + INTERVAL {lower_s} SECONDS "
            f"AND pay_ts + INTERVAL {upper_s} SECONDS"
        ),
        "inner",
    ).select(
        "order_id",
        "tx_id",
        "pay_channel",
        F.col("pay_ts").cast("long").alias("pay_ts_s"),
        F.col("receipt_ts").cast("long").alias("receipt_ts_s"),
    )


def tx_match_join_stream(
    orders: DataFrame,
    receipts: DataFrame,
    lower_s: int = -3,
    upper_s: int = 5,
    delay: str = "10 seconds",
) -> DataFrame:
    """J2 in its Spark-native form (SURVEY.md §2.9): a FULL OUTER
    stream-stream join with the same equi-key + time-range condition as
    :func:`tx_interval_join_stream`. When a buffered row's match window
    passes both watermarks, Spark emits it null-padded — exactly the
    reference's unmatched-pays / unmatched-receipts side outputs
    (TxPayMatch.java:76-77) without a custom state machine. The
    stateful-op twin (streaming.stateful.tx_match_stream) provides the
    precise per-side timeout variant; this one is the built-in path."""
    pays = (
        orders.filter(F.col("tx_id") != "")
        .withWatermark("ts", delay)
        .select("order_id", "tx_id", F.col("ts").alias("pay_ts"))
    )
    rcpts = receipts.withWatermark("ts", delay).select(
        F.col("tx_id").alias("r_tx_id"),
        F.col("pay_channel"),
        F.col("ts").alias("receipt_ts"),
    )
    joined = pays.join(
        rcpts,
        F.expr(
            f"tx_id = r_tx_id AND receipt_ts BETWEEN pay_ts + INTERVAL {lower_s} SECONDS "
            f"AND pay_ts + INTERVAL {upper_s} SECONDS"
        ),
        "full_outer",
    )
    return joined.select(
        F.coalesce("tx_id", "r_tx_id").alias("tx_id"),
        F.col("pay_ts").cast("long").alias("pay_ts_s"),
        F.col("receipt_ts").cast("long").alias("receipt_ts_s"),
        F.when(F.col("tx_id").isNotNull() & F.col("r_tx_id").isNotNull(), F.lit("matched"))
        .when(F.col("r_tx_id").isNull(), F.lit("unmatched_pay"))
        .otherwise(F.lit("unmatched_receipt"))
        .alias("result_type"),
    )


def drift_monitor_stream(
    events_stream: DataFrame,
    reference: DataFrame,
    sink,
    key_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 10,
    ref_hist: "tuple[DataFrame, DataFrame] | None" = None,
):
    """Streaming distribution-drift monitor: score every micro-batch's
    value distribution per key against a static reference corpus via
    PSI (operators.drift) and hand ``(psi_df, epoch_id)`` to ``sink``
    — the production shape of the batch ``value_drift_psi`` query
    (deploy watch: the reference is last month's corpus, the stream is
    live traffic, an alert fires when any key's psi crosses ~0.25).

    PSI needs per-batch totals and a full bucket grid, so the operator
    runs under ``foreachBatch`` (full batch semantics per micro-batch)
    rather than as a stateful aggregation. The reference is reduced
    ONCE, outside the loop, to its (bounds, per-(key, bucket) counts)
    histogram — pass a stored :func:`operators.drift.reference_histogram`
    pair via ``ref_hist`` and the reference corpus is touched zero
    times per batch; the per-batch work is one narrow scan of the
    batch + joins against two broadcast-sized frames. Keys the batch
    has never seen score against the reference's buckets (and vice
    versa: a batch key absent from the reference drifts maximally) —
    the grid is the UNION of both sides' keys.
    """
    from pyspark.sql import functions as F

    from ..operators.drift import bucket_expr, psi_from_counts, reference_histogram

    if ref_hist is not None:
        bounds, ref_counts = ref_hist
    else:
        # materialize the reduction HERE, once: the histogram pair is
        # KB-sized (per-key bounds, keys x buckets counts) but its lazy
        # plan holds the full reference-corpus reduction, which would
        # otherwise re-execute inside every micro-batch's joins.
        # Collected local frames (not persist) so nothing cached can be
        # evicted or released out from under a long-running stream.
        lazy_bounds, lazy_counts = reference_histogram(
            reference, key_col, value_col, n_buckets
        )
        spark = reference.sparkSession
        bounds = spark.createDataFrame(lazy_bounds.collect(), lazy_bounds.schema)
        ref_counts = spark.createDataFrame(lazy_counts.collect(), lazy_counts.schema)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        batch_counts = (
            batch_df.select(key_col, value_col)
            .crossJoin(F.broadcast(bounds))
            .select(key_col, bucket_expr(value_col, n_buckets))
            .groupBy(key_col, "bucket")
            .agg(F.count(F.lit(1)).alias("c_new"))
        )
        keys = (
            ref_counts.select(key_col)
            .union(batch_counts.select(key_col))
            .distinct()
        )
        grid = keys.select(
            key_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
        )
        filled = (
            grid.join(F.broadcast(ref_counts), [key_col, "bucket"], "left")
            .join(F.broadcast(batch_counts), [key_col, "bucket"], "left")
            .select(
                key_col,
                "bucket",
                F.coalesce("c_ref", F.lit(0)).alias("c0"),
                F.coalesce("c_new", F.lit(0)).alias("c1"),
            )
        )
        psi = psi_from_counts(filled, key_col, n_buckets).withColumnRenamed(
            "n_first", "n_reference"
        ).withColumnRenamed("n_second", "n_batch")
        sink(psi, epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def heavy_hitters_stream(
    events_stream: DataFrame,
    sink,
    col: str = "event_type",
    k: int = 16,
    seed: "tuple[dict[str, int], int] | None" = None,
):
    """Continuous Misra-Gries heavy hitters over a stream: each
    micro-batch is sketched DISTRIBUTED (operators.sketches.misra_gries
    — per-partition C-speed partials, one ≤ k×P-row combine), then
    merged into the running k-summary, which is held driver-side
    because the PODS'12 mergeable-summaries theorem makes that both
    sound and tiny: merging k-summaries (add counters, re-compress to
    k) preserves the global ``est ≤ true ≤ est + n/(k+1)`` bound
    REGARDLESS of the merge tree, and the running state is ≤ k
    counters — bytes, not data. ``sink(df, epoch_id)`` receives the
    current sketch as ``(item, est, n_seen)`` after every batch.

    This is the streaming answer the reference's per-window exact
    Top-N (HotItems) cannot give at 100 TB/day key cardinalities: the
    shuffled state per batch is capped at k rows per partition no
    matter how many distinct keys the stream carries.

    Restart contract: the running sketch lives in THIS process (a
    foreachBatch closure), not in the checkpoint — after a restart the
    stream resumes from the checkpoint offsets but the sketch restarts
    empty unless seeded. The emitted ``(item, est, n_seen)`` frame IS
    the whole state: persist the last epoch's frame wherever you like
    and replay it into a restarted monitor via ``seed`` (a
    ``({item: est}, n_seen)`` pair). A seeded monitor evolves
    IDENTICALLY to one that never restarted — both hold a k-summary
    and fold each batch's sketch in with the same PODS'12 merge — so
    restart parity is an equality (pinned by
    tests/test_streaming.py::test_heavy_hitters_stream_restart...),
    while accuracy vs TRUE counts keeps the usual n/(k+1) bound."""
    import pandas as pd

    from ..caching import release_scope
    from ..operators.sketches import _compress, misra_gries

    # drop the empty-state placeholder entry (item=None) a no-data
    # epoch emits — seeding from such a frame must not crash or
    # inject a phantom counter
    seeded = {i: int(c) for i, c in (seed[0] if seed else {}).items() if i is not None}
    state = {
        "counts": pd.Series(seeded, dtype="int64"),
        "n": seed[1] if seed else 0,
    }

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            # one source scan per batch: the sketch and the batch total
            # are two actions over the same persisted projection, and n
            # counts only non-null keys — the sketch can never emit a
            # null item, so a null-heavy batch must not inflate the
            # n/(k+1) error budget
            sel = batch_df.select(col).filter(F.col(col).isNotNull()).persist()
            try:
                batch_rows = misra_gries(sel, col, k).collect()
                state["n"] += sel.count()
            finally:
                sel.unpersist()
            if batch_rows:
                batch_sketch = pd.Series(
                    {r.item: r.est for r in batch_rows}, dtype="int64"
                )
                merged = state["counts"].add(batch_sketch, fill_value=0)
                state["counts"] = _compress(merged.astype("int64"), k)
            out = spark.createDataFrame(
                [
                    (str(item), int(est), int(state["n"]))
                    for item, est in state["counts"].items()
                ]
                or [(None, None, int(state["n"]))],
                "item string, est long, n_seen long",
            )
            sink(out, epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def cms_stream(
    events_stream: DataFrame,
    sink,
    col: str = "event_type",
    watch: list[str] | None = None,
    width: int = 512,
    depth: int = 4,
    seed: "tuple[dict[tuple[int, int], int], int] | None" = None,
    counter_snapshot=None,
):
    """Continuous Count-Min frequency monitor: each micro-batch is
    sketched DISTRIBUTED (operators.sketches.count_min_sketch — one
    map-side-combined shuffle onto the ≤ depth×width key space), then
    merged into the running counter table driver-side. Unlike the
    Misra-Gries merge, the CM merge is EXACT counter addition — the
    streamed sketch after N batches is bit-identical to sketching the
    concatenated input, so batch/stream parity is an equality, not a
    bound (pinned by tests/test_streaming.py). The running state is
    ≤ depth×width longs — bytes, not data.

    ``sink(df, epoch_id)`` receives, after every batch, the estimate
    for each ``watch`` item (plus the running total) as
    ``(item, est_c, n_seen)`` — the live "how often has X occurred"
    surface the reference's per-window exact counts can't give over
    unbounded key spaces.

    Restart contract: the counter table lives in this process, not the
    checkpoint — and unlike heavy_hitters_stream the per-watch-item
    estimates the sink sees CANNOT reconstruct it, so durability has
    its own hooks: ``counter_snapshot(counters, n_seen, epoch_id)``
    receives the full (r, b) -> c table after every batch (persist it
    wherever you like — it is <= depth x width longs), and ``seed``
    replays the last snapshot into a restarted monitor. Seeding is
    exact, not approximate, because the CM merge is plain counter
    addition (pinned by the restart test in tests/test_streaming.py)."""
    import hashlib

    from ..caching import release_scope
    from ..operators.sketches import count_min_sketch

    watch = list(watch or [])
    counters: dict[tuple[int, int], int] = dict(seed[0]) if seed else {}
    state = {"n": seed[1] if seed else 0}

    def _buckets(item: str) -> list[tuple[int, int]]:
        # the same md5-prefix hash count_min_sketch computes JVM-side
        return [
            (i, int(hashlib.md5(f"{item}:{i}".encode()).hexdigest()[:8], 16) % width)
            for i in range(depth)
        ]

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            sel = batch_df.select(col).filter(F.col(col).isNotNull()).persist()
            try:
                for r in count_min_sketch(sel, col, width, depth).collect():
                    key = (r["r"], r["b"])
                    counters[key] = counters.get(key, 0) + int(r["c"])
                state["n"] += sel.count()
            finally:
                sel.unpersist()
            out = spark.createDataFrame(
                [
                    (
                        w,
                        min(counters.get(rb, 0) for rb in _buckets(w)),
                        state["n"],
                    )
                    for w in watch
                ]
                or [(None, None, state["n"])],
                "item string, est_c long, n_seen long",
            )
            sink(out, epoch_id)
            if counter_snapshot is not None:
                counter_snapshot(dict(counters), state["n"], epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def reservoir_stream(
    events_stream: DataFrame,
    sink,
    id_col: str,
    weight_sql: str,
    stratum_col: str,
    m: int,
    ares_seed: int = 1,
    seed: "list[tuple[str, int, float]] | None" = None,
    id_type: str = "long",
    stratum_type: str = "string",
):
    """Continuous weighted reservoir (A-Res) over a stream: each
    micro-batch is sampled DISTRIBUTED (operators.sampling.
    weighted_sample — per-stratum top-m by the deterministic
    Efraimidis-Spirakis key), then merged into the running reservoir
    driver-side. The merge is exact, not approximate:
    top-m(top-m(A) ∪ B) = top-m(A ∪ B) for any priority order, and the
    A-Res key is a pure function of (ares_seed, id), so the streamed
    reservoir after N batches is IDENTICAL to batch-sampling the
    concatenated input (pinned by tests/test_streaming.py) — the
    streaming sampler a training pipeline can trust to be replayable.
    Running state is <= m rows per stratum — the sample manifest
    itself.

    ``sink(df, epoch_id)`` receives the current manifest
    ``(stratum, id, wkey, rank)`` after every batch. Restart contract:
    the manifest IS the state — pass the last emitted manifest's
    ``(stratum, id, wkey)`` rows to a restarted monitor via ``seed``
    and it continues exactly where the old one stopped (the manifest
    carries the already-computed priority keys, so nothing needs the
    original weight column back; the top-m merge rule above makes the
    continuation identical to an uninterrupted run — pinned by
    tests/test_streaming.py).

    REQUIRES ids unique per stratum: the merge dedupes bit-identical
    (wkey, id) pairs to absorb at-least-once batch replays, so a
    GENUINE duplicate id (same id ⇒ same wkey, a pure function of
    ares_seed and id) collapses to one rank here, while batch
    ``weighted_sample`` over the concatenated input ranks both rows
    via row_number — the batch-parity guarantee above holds only for
    per-stratum-unique ids.

    ``id_type``/``stratum_type`` name the columns' Spark SQL types for
    the driver-side manifest frame (the dq_monitor_stream group_type
    convention) — ids must still be NUMERIC (the A-Res key is
    arithmetic on the id; pre-hash string keys first)."""
    from ..caching import release_scope
    from ..operators.sampling import weighted_sample

    if isinstance(seed, int):
        # the pre-r11 signature had `seed: int = 1` as the A-Res hash
        # seed in this position; fail loudly instead of silently
        # replaying an int as a restart manifest
        raise TypeError(
            "reservoir_stream(seed=...) now takes the restart manifest "
            "(list of (stratum, id, wkey) rows); pass the A-Res hash "
            "seed as ares_seed=..."
        )
    state: dict[str, list] = {}  # stratum -> [(wkey, id)] sorted desc
    if seed:
        for stratum, vid, wkey in seed:
            if vid is None or wkey is None:
                continue  # empty-state placeholder row, not a sample
            state.setdefault(stratum, []).append((wkey, vid))

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            batch_top = weighted_sample(
                batch_df, id_col, weight_sql, stratum_col, m, ares_seed
            ).select(stratum_col, id_col, "wkey")
            for r in batch_top.collect():
                state.setdefault(r[stratum_col], []).append((r["wkey"], r[id_col]))
            rows = []
            for stratum, kept in state.items():
                # dedupe (wkey, id) pairs before truncating: foreachBatch
                # is at-least-once across restarts, and a replayed batch
                # re-appends bit-identical pairs (wkey is a pure function
                # of ares_seed and id) — without the set() a duplicate
                # would occupy two ranks and evict a distinct sample
                kept[:] = sorted(set(kept), key=lambda t: (-t[0], t[1]))
                del kept[m:]
                rows += [
                    (stratum, vid, wkey, rank)
                    for rank, (wkey, vid) in enumerate(kept, 1)
                ]
            out = spark.createDataFrame(
                rows or [(None, None, None, None)],
                f"{stratum_col} {stratum_type}, {id_col} {id_type},"
                " wkey double, rank int",
            )
            sink(out, epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def kmv_stream(
    events_stream: DataFrame,
    sink,
    set_col: str,
    val_sql: str,
    k: int = 128,
    seed: "list[tuple[str, int]] | None" = None,
):
    """Continuous per-set distinct-cardinality monitor on the KMV
    sketch — the fourth member of the sketch-monitor family
    (Misra-Gries counts, Count-Min frequencies, A-Res samples, KMV
    cardinalities). Each micro-batch's per-set k-minima are computed
    DISTRIBUTED (operators.sketches.kmv_minima — one-pass per-task
    partial top-k, O(k) survivors per set per task), then merged into
    the running sketch driver-side. The merge is EXACT, same shape as the
    reservoir's: the k smallest distinct hashes of
    kmin(A) ∪ kmin(B) are the k smallest distinct hashes of A ∪ B
    (any true union minimum is a minimum of its own side), and the
    md5 hash is a pure function of the value — so the streamed sketch
    after N batches is IDENTICAL to batch-sketching the concatenated
    input, and the emitted estimate bit-matches batch
    ``kmv_estimate`` (pinned by tests/test_streaming.py). Running
    state is <= k hashes per set — bytes, not data.

    ``sink(df, epoch_id)`` receives the full manifest
    ``(s, h, rn, est)`` after every batch: the per-set minima (ranked
    by hash ascending) plus the set's current cardinality estimate,
    computed with the same integer arithmetic as ``kmv_est_expr`` —
    exact count below k kept hashes, else (k-1) * 2^32 div h_k.
    Restart contract: the manifest IS the state — pass the last
    emitted ``(s, h)`` rows back via ``seed`` (hashes carry over; no
    raw values needed)."""
    from ..caching import release_scope
    from ..operators.sketches import CMS_SPACE, kmv_minima

    state: dict[str, list[int]] = {}  # set -> sorted unique hashes, <= k
    if seed:
        for s, h in seed:
            if h is None:
                continue  # empty-state placeholder row, not a minimum
            state.setdefault(s, []).append(h)
        for s in state:
            state[s] = sorted(set(state[s]))[:k]

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            batch_min = kmv_minima(batch_df, set_col, val_sql, k)
            for r in batch_min.collect():
                state.setdefault(r["s"], []).append(r["h"])
            rows = []
            for s, hs in state.items():
                merged = sorted(set(hs))[:k]
                state[s] = merged
                n_kept = len(merged)
                est = (
                    n_kept
                    if n_kept < k
                    else (k - 1) * CMS_SPACE // merged[-1]
                )
                rows += [
                    (s, h, rn, est) for rn, h in enumerate(merged, 1)
                ]
            out = spark.createDataFrame(
                rows or [(None, None, None, None)],
                "s string, h long, rn int, est long",
            )
            sink(out, epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def kll_stream(
    events_stream: DataFrame,
    sink,
    set_col: str,
    val_col: str,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
    k: int = 200,
    seed: "list[tuple[str, bytes]] | None" = None,
    sketch_snapshot=None,
):
    """Continuous per-set QUANTILE monitor on the native Datasketches
    KLL sketch — the fifth member of the sketch-monitor family
    (Misra-Gries counts, Count-Min frequencies, A-Res samples, KMV
    cardinalities, and now KLL quantiles: the live "what is p99
    latency/length right now" surface). Each micro-batch is sketched
    DISTRIBUTED (``kll_sketch_agg_double`` per set, partial buffers
    map-side combined), then merged JVM-side into the running per-set
    sketch BYTES the driver holds: the merge is one
    ``kll_merge_agg_double`` over a tiny (set, bytes) frame of the
    stored sketches plus the batch's, so the driver never touches
    values — only opaque blobs, O(k·log n) doubles per set.

    Parity contract (pinned in tests/test_streaming.py) — the honest
    analog of the other monitors' bit-parity, i.e. exactly what the
    sketch itself guarantees: a set whose TOTAL value count stays
    <= k keeps every value through every merge, so streamed quantiles
    are EXACT order statistics equal to the batch
    ``kll_quantile_rollup`` under ANY batch split; larger sets carry
    the Karnin-Lang-Liberty normalized-rank bound (ε ≈ 1.7/√k), NOT
    bit-equality — KLL compaction is merge-order-sensitive (measured
    in the batch operator's docstring: repartitioning alone moves
    q95 ~0.1%), which is also why the registry row is rows-only.

    Replay guard: the KLL merge is NOT idempotent (a re-merged batch
    double-counts its values — unlike the KMV/A-Res merges, whose
    keys are pure functions of the input and dedupe), and foreachBatch
    retries a failed epoch with the SAME epoch_id — so the monitor
    records the last epoch it merged and a redelivered epoch re-EMITS
    current state without re-merging (pinned by the crash-replay
    test). State is merged BEFORE the sink runs, so a sink failure
    cannot lose a merge or double it.

    Restart contract (the cms_stream shape — the emitted quantiles
    cannot reconstruct the sketch): ``sketch_snapshot(state,
    epoch_id)`` receives the full {set: bytes} map after every batch;
    ``seed`` replays the last snapshot into a restarted monitor.
    Quantile columns are named by the shared
    ``operators.sketches.kll_quantile_names`` so the stream and batch
    surfaces cannot drift.

    ``sink(df, epoch_id)`` receives ``(s, n_vals, q_<pct>...)`` per
    monitored set after every batch."""
    from ..caching import release_scope
    from ..operators.sketches import kll_quantile_names

    names = kll_quantile_names(quantiles)
    state: dict[str, bytes] = {
        s: bytes(b) for s, b in (seed or []) if s is not None and b is not None
    }
    last = {"epoch": None}
    empty_schema = "s string, n_vals long, " + ", ".join(
        f"{nm} double" for nm in names
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            if epoch_id != last["epoch"]:
                cells = (
                    batch_df.filter(F.col(val_col).isNotNull())
                    .groupBy(F.col(set_col).alias("s"))
                    .agg(
                        F.kll_sketch_agg_double(F.col(val_col), F.lit(k)).alias("sk")
                    )
                    .collect()
                )
                if cells:
                    rows = [(r["s"], bytes(r["sk"])) for r in cells]
                    rows += [(s, b) for s, b in state.items()]
                    merged = (
                        spark.createDataFrame(rows, "s string, sk binary")
                        .groupBy("s")
                        .agg(F.kll_merge_agg_double("sk").alias("msk"))
                        .collect()
                    )
                    for r in merged:
                        state[r["s"]] = bytes(r["msk"])
                last["epoch"] = epoch_id
            if state:
                # NULL set keys are a real group (Spark groupBy keeps
                # them); a plain sort would raise on None vs str
                frame = spark.createDataFrame(
                    sorted(state.items(), key=lambda kv: (kv[0] is None, kv[0])),
                    "s string, msk binary",
                )
                out = frame.select(
                    "s",
                    F.kll_sketch_get_n_double("msk").cast("long").alias("n_vals"),
                    *[
                        F.kll_sketch_get_quantile_double("msk", F.lit(float(q))).alias(nm)
                        for q, nm in zip(quantiles, names)
                    ],
                )
            else:
                out = spark.createDataFrame(
                    [(None, None) + (None,) * len(names)], empty_schema
                )
            sink(out, epoch_id)
            if sketch_snapshot is not None:
                sketch_snapshot(dict(state), epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def _merge_extreme(cur: float, v: float, kind: str) -> float:
    """Merge one running extreme with Spark's NaN ORDERING (NaN is
    GREATER than any double): max prefers NaN the moment one appears,
    min avoids NaN unless nothing else ever arrived. Python's bare
    min()/max() are order-dependent under NaN (every comparison is
    False, so whichever argument sits in the short-circuit slot wins),
    which would break the pinned row-identical parity between a
    split-stream run and the batch run_expectations audit (r13
    advisory)."""
    import math

    if kind == "max":
        return float("nan") if (math.isnan(cur) or math.isnan(v)) else max(cur, v)
    if math.isnan(cur):
        return v
    if math.isnan(v):
        return cur
    return min(cur, v)


def dq_monitor_stream(
    events_stream: DataFrame,
    sink,
    spec: "tuple[tuple, ...]",
    seed: "dict | None" = None,
    state_snapshot=None,
    group_col: "str | None" = None,
    group_type: str = "string",
):
    """Continuous data-quality expectation monitor — the streaming twin
    of the batch ``operators.dq.run_expectations`` audit (and the sixth
    monitor of the family): the live "is the feed still honoring its
    ingest contract" surface. ``spec`` declares the mergeable subset of
    the batch checks:

    - ``("completeness", col)`` — running count(col)/count(*);
    - ``("min", col, lo)`` / ``("max", col, hi)`` — running extrema;
    - ``("accepted", col, values)`` — running in-set fraction of
      non-NULL values.

    ``uniqueness`` is deliberately NOT in the streaming spec: its
    exact-distinct state is data-sized (the one batch check that
    shuffles an expand); a streaming key audit belongs to the KMV/HLL
    monitors, which hold sketch-sized state for the same question.

    Parity contract (pinned in tests/test_streaming.py): every counter
    is an exact integer sum or a running min/max — associative,
    commutative, duplicate-batch-free via the epoch guard — so after
    ANY batch split the emitted frame is ROW-IDENTICAL to the batch
    audit over the concatenated input, including the terminal
    rounding: the per-epoch frame applies the SAME Spark
    ``round(num/den, 6)`` expression the batch operator uses, so no
    Python-vs-JVM rounding seam exists.

    Scale shape: each micro-batch runs ONE distributed aggregation
    (every declared metric a column of the same physical agg — the
    batch operator's one-scan discipline) and collects exactly one
    row; driver state is one number per counter, bytes forever.

    Replay guard (the kll_stream shape): counter addition is not
    idempotent and foreachBatch redelivers a failed epoch with the
    SAME epoch_id, so a redelivered epoch re-EMITS current state
    without re-merging. State merges BEFORE the sink runs.

    Restart contract: ``state_snapshot(state, epoch_id)`` receives the
    full counter dict after every batch; passing it back as ``seed``
    makes a restarted monitor evolve identically to one that never
    stopped (counter merge is order-free).

    ``sink(df, epoch_id)`` receives the full (check_name, metric, lo,
    hi, passed) frame — constant |spec| rows — after every batch.

    ``group_col`` runs the audit PER GROUP (the batch ``group_cols``
    twin: "completeness per source", live), with ``group_type`` naming
    its Spark SQL type for the emitted frame (default ``string``; pass
    e.g. ``"bigint"`` for an int shard id — the centroid_drift_stream
    convention, r13 advisory): the per-batch aggregation
    groups on it, driver state holds one counter set per group, and
    the emitted frame leads with the group column — |groups|·|spec|
    rows. The group must be a SEMANTIC dimension (source, state,
    shard), not data-sized: the per-batch collect and the driver dict
    are |groups|-bounded, the same contract as cms_stream's watch
    manifest. Grouped parity to the batch audit and grouped
    snapshot/seed restart hold by the same counter-merge argument
    (pinned in tests/test_streaming.py)."""
    from ..caching import release_scope

    kinds = {"completeness", "min", "max", "accepted"}
    names = []
    for entry in spec:
        kind, col = entry[0], entry[1]
        if kind not in kinds:
            raise ValueError(f"dq_monitor_stream: unknown check kind {kind!r}")
        names.append(f"{kind}:{col}")
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")

    # global mode: state is the flat counter dict; grouped mode: one
    # counter dict per group value (seed shape matches either mode)
    if group_col is None:
        state: dict = dict(seed) if seed else {}
    else:
        state = {g: dict(c) for g, c in (seed or {}).items()}
    last = {"epoch": None}

    def _merge_into(st: dict, row) -> None:
        st["n"] = st.get("n", 0) + row["n"]
        merged_nn = set()  # nn:<col> is SHARED by completeness+accepted
        for entry in spec:
            kind, col = entry[0], entry[1]
            if kind in ("completeness", "accepted") and col not in merged_nn:
                merged_nn.add(col)
                k = f"nn:{col}"
                st[k] = st.get(k, 0) + row[k.replace(":", "_")]
            if kind == "accepted":
                k = f"in:{col}"
                st[k] = st.get(k, 0) + row[k.replace(":", "_")]
            if kind in ("min", "max"):
                k = f"{kind}:{col}"
                v = row[k.replace(":", "_")]
                if v is not None:
                    cur = st.get(k)
                    st[k] = float(v) if cur is None else _merge_extreme(cur, float(v), kind)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            if epoch_id != last["epoch"]:
                aggs = [F.count(F.lit(1)).alias("n")]
                seen = set()
                for entry in spec:
                    kind, col = entry[0], entry[1]
                    if kind in ("completeness", "accepted") and f"nn_{col}" not in seen:
                        seen.add(f"nn_{col}")
                        aggs.append(F.count(col).alias(f"nn_{col}"))
                    if kind == "accepted":
                        aggs.append(
                            F.count(F.when(F.col(col).isin(*entry[2]), F.lit(1))).alias(
                                f"in_{col}"
                            )
                        )
                    if kind in ("min", "max"):
                        fn = F.min if kind == "min" else F.max
                        aggs.append(fn(col).cast("double").alias(f"{kind}_{col}"))
                if group_col is None:
                    (row,) = batch_df.agg(*aggs).collect()
                    _merge_into(state, row)
                else:
                    # |groups|-bounded collect (semantic dimension)
                    for row in batch_df.groupBy(group_col).agg(*aggs).collect():
                        _merge_into(state.setdefault(row[group_col], {}), row)
                last["epoch"] = epoch_id

            # (check_name, kind, a, b, lo, hi): ratio checks carry
            # (numerator, denominator), value checks (value, NULL) —
            # the metric/passed expressions below are the BATCH
            # operator's, evaluated by the same engine
            def _check_rows(st: dict) -> list:
                out_rows = []
                n = st.get("n", 0)
                for entry in spec:
                    kind, col = entry[0], entry[1]
                    nm = f"{kind}:{col}"
                    if kind == "completeness":
                        out_rows.append((nm, "ratio", float(st.get(f"nn:{col}", 0)), float(n), 1.0, 1.0))
                    elif kind == "accepted":
                        out_rows.append(
                            (nm, "ratio", float(st.get(f"in:{col}", 0)),
                             float(st.get(f"nn:{col}", 0)), 1.0, 1.0)
                        )
                    elif kind == "min":
                        out_rows.append((nm, "value", st.get(nm), None, float(entry[2]), None))
                    else:
                        out_rows.append((nm, "value", st.get(nm), None, None, float(entry[2])))
                return out_rows

            schema = "check_name string, kind string, a double, b double, lo double, hi double"
            lead = []
            if group_col is None:
                rows = _check_rows(state)
            else:
                rows = [
                    (g,) + r
                    for g in sorted(state, key=lambda x: (x is None, x))
                    for r in _check_rows(state[g])
                ]
                schema = f"{group_col} {group_type}, " + schema
                lead = [group_col]
            frame = spark.createDataFrame(rows, schema)
            metric = F.when(
                F.col("kind") == "ratio",
                F.when(F.col("b") > 0, F.round(F.col("a") / F.col("b"), 6)),
            ).otherwise(F.round(F.col("a"), 6))
            out = frame.select(
                *lead,
                "check_name",
                metric.alias("metric"),
                "lo",
                "hi",
            ).select(
                *lead,
                "check_name",
                "metric",
                "lo",
                "hi",
                F.when(F.col("metric").isNull(), F.lit(0))
                .otherwise(
                    (
                        (F.col("lo").isNull() | (F.col("metric") >= F.col("lo")))
                        & (F.col("hi").isNull() | (F.col("metric") <= F.col("hi")))
                    ).cast("int")
                )
                .alias("passed"),
            )
            sink(out, epoch_id)
            if state_snapshot is not None:
                snap = (
                    dict(state)
                    if group_col is None
                    else {g: dict(c) for g, c in state.items()}
                )
                state_snapshot(snap, epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def centroid_drift_stream(
    events_stream: DataFrame,
    sink,
    group_col: str = "label",
    vec_col: str = "embedding",
    quant: float = 1e6,
    group_type: str = "string",
    seed: "dict | None" = None,
    state_snapshot=None,
):
    """Continuous embedding-centroid drift monitor — the streaming twin
    of the batch ``operators.similarity.centroid_drift`` (and the
    seventh monitor): the live "did a source's embedding mass move"
    surface for an ingest stream of vectors.

    Parity contract (pinned in tests/test_streaming.py): the batch
    operator quantizes components to exact BIGINTs before any sum, so
    its per-(group, dim) sums are plain integer additions — the
    monitor holds exactly those counters and merges each micro-batch's
    distributed ``centroid_sums`` output by addition (order-free,
    duplicate-batch-free via the epoch guard), then scores the
    state-rebuilt sums frame with the SAME ``centroid_drift_from_sums``
    code path. The emitted frame is therefore ROW-IDENTICAL to the
    batch operator over the concatenated input under ANY batch split —
    exact parity, not a sketch bound.

    Scale shape: each micro-batch runs one distributed explode +
    map-side-combined (group, dim) sum and collects ≤ |groups|·dim
    rows (groups are a semantic dimension — the cms_stream watch-
    manifest contract); driver state is one (s, c) long pair per
    (group, dim) cell. Replay guard and snapshot/seed restart follow
    the dq_monitor_stream shape.

    ``sink(df, epoch_id)`` receives (group, n_vecs, cos_to_global,
    norm_ratio) — |groups| rows — after every batch."""
    from ..caching import release_scope
    from ..operators.similarity import centroid_drift_from_sums, centroid_sums

    # state: {(g, pos): [s, c]} exact longs
    state: dict = {k: list(v) for k, v in (seed or {}).items()}
    last = {"epoch": None}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            if epoch_id != last["epoch"]:
                rows = centroid_sums(batch_df, group_col, vec_col, quant).collect()
                for r in rows:  # |groups| x dim — bounded collect
                    if r["s"] is None:
                        # every component NULL for this (g, pos): SQL
                        # sum contributes nothing — adding None would
                        # TypeError and kill the query instead
                        continue
                    cell = state.setdefault((r["g"], r["pos"]), [0, 0])
                    cell[0] += r["s"]
                    cell[1] += r["c"]
                last["epoch"] = epoch_id
            if state:
                per = spark.createDataFrame(
                    [
                        (g, p, s, c)
                        for (g, p), (s, c) in sorted(
                            state.items(),
                            key=lambda kv: (kv[0][0] is None, kv[0][0], kv[0][1]),
                        )
                    ],
                    f"g {group_type}, pos int, s long, c long",
                )
                out = centroid_drift_from_sums(per, group_col)
            else:
                out = spark.createDataFrame(
                    [(None, None, None, None)],
                    f"{group_col} {group_type}, n_vecs long,"
                    " cos_to_global double, norm_ratio double",
                )
            sink(out, epoch_id)
            if state_snapshot is not None:
                state_snapshot({k: tuple(v) for k, v in state.items()}, epoch_id)

    return events_stream.writeStream.foreachBatch(_process)


def t_closeness_stream(
    records_stream: DataFrame,
    sink,
    quasi_cols: "list[str] | tuple[str, ...]" = ("label",),
    sensitive_col: str = "band",
    t: float = 0.2,
    quasi_types: "str | list[str]" = "string",
    sensitive_type: str = "bigint",
    seed: "dict | None" = None,
    state_snapshot=None,
):
    """Continuous t-closeness monitor — the streaming twin of the batch
    ``operators.sampling.t_closeness`` gate (and the eighth monitor):
    the live "is any quasi-identifier class's sensitive-value
    distribution drifting away from the corpus" surface for an ingest
    stream feeding a privacy-gated release.

    Parity contract (pinned in tests/test_streaming.py): the batch
    operator's only data-dependent state is the (class, value) cell
    count table — everything downstream is exact BIGINT arithmetic on
    those cells — so the monitor holds exactly those counters and
    merges each micro-batch's distributed groupBy output by addition
    (order-free, duplicate-batch-free via the epoch guard), then
    scores the state-rebuilt cell frame through the SAME operator via
    its ``weight_col`` path. The emitted frame is therefore
    ROW-IDENTICAL to the batch gate over the concatenated input under
    ANY batch split — exact parity, not an approximation.

    Scale shape: each micro-batch runs one map-side-combined
    (quasi…, value) count and collects ≤ |classes|·|values| rows
    (both semantic dimensions — the cms_stream watch-manifest
    contract); driver state is one long per cell. Replay guard and
    snapshot/seed restart follow the dq_monitor_stream shape.

    ``sink(df, epoch_id)`` receives (quasi…, class_size, t_tvd, t_emd,
    keep) — |classes| rows — after every batch."""
    from ..caching import release_scope
    from ..operators.sampling import t_closeness

    quasi_cols = list(quasi_cols)
    qt = (
        list(quasi_types)
        if isinstance(quasi_types, (list, tuple))
        else [quasi_types] * len(quasi_cols)
    )
    cell_schema = (
        ", ".join(f"{c} {ty}" for c, ty in zip(quasi_cols, qt))
        + f", {sensitive_col} {sensitive_type}, _w long"
    )
    out_schema = (
        ", ".join(f"{c} {ty}" for c, ty in zip(quasi_cols, qt))
        + ", class_size long, t_tvd double, t_emd double, keep int"
    )
    # state: {(quasi…, value): n} exact longs
    state: dict = dict(seed or {})
    last = {"epoch": None}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        with release_scope():
            spark = batch_df.sparkSession
            if epoch_id != last["epoch"]:
                rows = (
                    batch_df.groupBy(*quasi_cols, sensitive_col).count().collect()
                )
                for r in rows:  # |classes| x |values| — bounded collect
                    k = tuple(r[c] for c in quasi_cols) + (r[sensitive_col],)
                    state[k] = state.get(k, 0) + r["count"]
                last["epoch"] = epoch_id
            if state:
                cells = spark.createDataFrame(
                    sorted(
                        ((*k, n) for k, n in state.items()),
                        key=lambda row: tuple((x is None, x) for x in row),
                    ),
                    cell_schema,
                )
                out = t_closeness(
                    cells, quasi_cols, sensitive_col, t, weight_col="_w"
                )
            else:
                out = spark.createDataFrame(
                    [tuple([None] * (len(quasi_cols) + 4))], out_schema
                )
            sink(out, epoch_id)
            if state_snapshot is not None:
                state_snapshot(dict(state), epoch_id)

    return records_stream.writeStream.foreachBatch(_process)
