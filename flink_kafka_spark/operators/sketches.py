"""Mergeable frequency sketches (engine extension).

The reference's only approximate state is the UV Bloom filter
(UvWithBloom.java:60-92, covered by operators/windows.py); this module
adds the other sketch a 100 TB counting pipeline needs: Misra-Gries
heavy hitters, in the *mergeable summaries* formulation (Agarwal,
Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):
a k-counter summary computed per partition, merged by summing counters
and re-compressing to k. The merged estimate underestimates every
item's true count by at most n/(k+1), and every item with true count
> n/(k+1) is guaranteed to survive — both properties are independent
of the merge tree, which is exactly what makes the sketch shuffle-safe
(partition-local partials, one tiny final combine).

Why not plain ``groupBy(col).count()``: an exact count shuffles one
row per distinct key. For heavy-tail key spaces (urls, user agents,
n-grams) the distinct count is itself corpus-sized; the sketch caps
the shuffled state at k rows per partition regardless of cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _compress(counts: pd.Series, k: int) -> pd.Series:
    """Compress an exact histogram to a Misra-Gries k-summary: keep the
    top-k items with the (k+1)-th largest count subtracted (the PODS'12
    merge step). Items dropping to <= 0 vanish; the discarded mass is
    what the n/(k+1) error bound accounts for."""
    if len(counts) <= k:
        return counts
    # stable tie-break on the item value so partials are deterministic
    # for a given partition content, not hash-order-dependent
    ordered = counts.sort_index().sort_values(ascending=False, kind="stable")
    t = int(ordered.iloc[k])
    kept = (ordered.iloc[:k] - t).astype("int64")
    return kept[kept > 0]


def misra_gries(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Approximate heavy hitters of ``df[col]``: one row per surviving
    item with its (under-)estimated count, ``est <= true <= est +
    n/(k+1)``.

    Plan: a narrow ``mapInPandas`` turns each partition into <= k
    (item, partial) rows — the per-partition histogram is a C-speed
    ``value_counts``, compressed once — then ONE shuffle over those
    tiny partials sums and re-compresses globally. Total shuffled
    bytes are O(k x partitions), never O(distinct items); no state
    larger than k rows ever sits on one task. Estimates (and which
    borderline items survive) depend on how rows were partitioned, so
    callers needing a partitioning-independent statement should assert
    the error/coverage bounds (see ``heavy_hitters_check``), not the
    raw counts."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        for pdf in batches:
            c = pdf[col].value_counts()
            acc = c if acc is None else acc.add(c, fill_value=0)
        if acc is not None and len(acc):
            part = _compress(acc.astype("int64"), k)
            yield pd.DataFrame({"item": part.index.astype(str), "partial": part.values})

    from ..caching import track

    parts = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        partials, schema="item string, partial long"
    )
    # persist the <= k x P summed partials: two consumers (the top-k
    # ranking and the (k+1)-th-threshold subquery) would otherwise each
    # re-run the corpus-wide partials pass
    summed = track(parts.groupBy("item").agg(F.sum("partial").alias("est")).persist())
    # global re-compression, expressed over the <= k x P row frame:
    # subtract the (k+1)-th largest summed counter, drop <= 0
    w = Window.orderBy(F.col("est").desc(), F.col("item").asc())
    ranked = summed.withColumn("_rk", F.row_number().over(w))
    kth1 = ranked.filter(F.col("_rk") == k + 1).select(F.col("est").alias("_t"))
    return (
        ranked.filter(F.col("_rk") <= k)
        .crossJoin(F.broadcast(kth1.select(F.coalesce(F.max("_t"), F.lit(0)).alias("_t"))))
        .select("item", (F.col("est") - F.col("_t")).alias("est"))
        .filter(F.col("est") > 0)
    )
