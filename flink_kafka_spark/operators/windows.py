"""Event-time windowed aggregation (SURVEY.md §2.6 W1-W8, §2.7 A1-A10).

The reference hand-builds partial+final window counts
(``AggregateFunction`` + ``WindowFunction``, e.g. reference
``HotItemsAnalysis/.../HotItems.java:93-131``). In Spark the same
semantics are one declarative ``groupBy(window(...), keys).agg(...)`` —
Catalyst plans a partial aggregation before the shuffle automatically
(HashAggregateExec partial → final), so the reference's manual
salting/two-phase tricks (``PageView.java:73-88``) are unnecessary.

Window boundaries are emitted as **epoch seconds (long)** columns
``window_start_s`` / ``window_end_s``: integer output is stable across
engines/timezones, which matters for the DuckDB oracle harness, and is
cheaper to shuffle than a struct<timestamp,timestamp>.

Scale notes: the shuffle key is (window, *keys). Sliding windows
multiply rows by size/slide before the partial agg, but the partial agg
collapses them map-side, so shuffled volume is ~(#distinct keys ×
windows-per-row), not #rows. Keep size/slide ratios modest (≤ ~24) at
100 TB; for very fine slides prefer tumbling-at-slide-granularity then
roll up (see :func:`sliding_from_tumbling`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _project_bounds(df: DataFrame, keys: Sequence[str], aggs: Sequence[str]) -> DataFrame:
    """Replace the window struct with epoch-second long bounds."""
    return df.select(
        F.col("_w.start").cast("long").alias("window_start_s"),
        F.col("_w.end").cast("long").alias("window_end_s"),
        *keys,
        *aggs,
    )


_UNIT_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}

#: batch sliding counts switch to the tumbling-rollup plan at this
#: size/slide ratio (Expand would multiply every input row by it)
FINE_SLIDE_RATIO = 16


def _interval_s(spec: str) -> int:
    n, unit = spec.strip().split()
    return int(n) * _UNIT_S[unit.lower()]


def windowed_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str | None = None,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """COUNT(*) (+ optional extra aggs) per key × event-time window.

    Covers the reference's A1-A5, A8, A10 (per-item, per-url,
    per-channel×behavior, global, per-province window counts) — key
    choice is the only difference between them.

    The groupBy is on the ``window()`` struct itself (not pre-computed
    bounds) so Structured Streaming recognizes the event-time column
    and the same code runs watermarked on streams; bounds are projected
    to epoch-second longs after the aggregation.

    Batch plan selection: a fine slide (size/slide ≥ FINE_SLIDE_RATIO,
    e.g. the reference's 1h/5s W3 = 720×) would Expand every input row
    ratio-fold; pure counts on the batch path switch to the
    tumbling-partials rollup (:func:`sliding_from_tumbling`) which
    shuffles slide buckets instead. Streaming always uses window()
    (chained aggregations are unsupported in streaming queries).
    """
    if (
        slide is not None
        and not aggs
        and not df.isStreaming
        and _interval_s(size) // _interval_s(slide) >= FINE_SLIDE_RATIO
        and _interval_s(size) % _interval_s(slide) == 0
    ):
        return sliding_from_tumbling(df, ts_col, _interval_s(size), _interval_s(slide), keys)
    w = F.window(ts_col, size, slide) if slide else F.window(ts_col, size)
    out = df.groupBy(w.alias("_w"), *keys).agg(F.count(F.lit(1)).alias("cnt"), *aggs)
    agg_names = ["cnt", *[c for c in out.columns if c not in ("_w", "cnt", *keys)]]
    return _project_bounds(out, keys, agg_names)


def windowed_distinct(
    df: DataFrame,
    ts_col: str,
    size: str,
    distinct_col: str,
    keys: Sequence[str] = (),
    approximate: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """COUNT(DISTINCT x) per window — exact (reference A6,
    ``UniqueVisitor.java:64-73``) or approximate via HLL++ (replacing
    the reference's Redis-bitmap Bloom filter A7,
    ``UvWithBloomFilter.java:95-155``; README sizes the BF at 64 MB for
    1e8 users — HLL++ at rsd=0.02 needs a few KB per window and merges
    map-side, so the external store disappears entirely).

    Note for streaming: exact countDistinct isn't supported in a
    streaming aggregation — use ``approximate=True`` (mergeable HLL++
    sketch) or dropDuplicates upstream; the batch path is exact.
    """
    agg = (
        F.approx_count_distinct(distinct_col, rsd) if approximate else F.countDistinct(distinct_col)
    ).alias("uv")
    out = df.groupBy(F.window(ts_col, size).alias("_w"), *keys).agg(agg)
    return _project_bounds(out, keys, ["uv"])


def sliding_from_tumbling(
    df: DataFrame,
    ts_col: str,
    size_s: int,
    slide_s: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Scale path for fine-grained slides: aggregate once at slide
    granularity (tumbling), then roll partials into sliding windows.
    Shuffles #distinct (slide-bucket × key) rows instead of replicating
    every input row size/slide times — the right trade at 100 TB when
    size/slide is large (e.g. the reference's 1h/5s windows W3).
    """
    per_slide = (
        df.withColumn("_slide_start", (F.col(ts_col).cast("long") / slide_s).cast("long") * slide_s)
        .groupBy("_slide_start", *keys)
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    n = size_s // slide_s
    offsets = F.sequence(F.lit(0), F.lit(n - 1))
    return (
        per_slide.withColumn("_i", F.explode(offsets))
        .withColumn("window_start_s", F.col("_slide_start") - F.col("_i") * slide_s)
        .withColumn("window_end_s", F.col("window_start_s") + size_s)
        .groupBy("window_start_s", "window_end_s", *keys)
        .agg(F.sum("_partial").alias("cnt"))
    )


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted COUNT(*) for pathologically hot keys — the
    reference's manual skew fix (A9, ``PageView.java:73-88``: random
    key 0-9 then re-aggregate by window).

    Spark's map-side partial aggregation already handles ordinary
    skew (each task pre-aggregates before the shuffle), so this is an
    OPT-IN for the extreme case where even the partial-agg hash table
    on a single hot key's input partitions becomes the bottleneck:
    phase 1 shuffles on (key, salt) spreading one key over ``n_salts``
    reducers; phase 2 rolls the ≤n_salts partials per key together.
    Result is identical to ``groupBy(keys).count()``.
    """
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("_salt")
    phase1 = df.select(*keys, salt).groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias("cnt"))
