"""Distribution-drift primitives: equal-width value histograms and
Population Stability Index, shared by the batch ``value_drift_psi``
query (first vs second stream half) and the streaming
``drift_monitor_stream`` (each micro-batch vs a reference corpus).

The contract both paths rely on:

- bucket edges are GLOBAL (computed once over the reference/base
  frame) — per-side edges would re-normalize the drift away;
- counts stay integer-exact through every shuffle; the only floating
  math is the final per-row smoothing + ln transform (the
  classifier_score convention), so both engines/paths agree bit-for-
  bit up to the terminal rounding;
- every (key, bucket) cell of the full grid enters the sum — add-one
  smoothing makes empty buckets a finite penalty instead of a dropped
  term, which is what lets PSI flag "values appeared where there were
  none".

Scale design (100 TB): bucket assignment is a JVM expression against
a broadcast 1-row bounds frame; the only corpus-sized shuffle is the
map-side-combined (key, bucket) conditional-aggregation count, which
emits ≤ |keys|·buckets rows. Everything after operates on that tiny
frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def value_bounds(df: DataFrame, value_col: str = "value") -> DataFrame:
    """1-row (vmin, vmax) frame — broadcast onto the scan by callers."""
    return df.agg(F.min(value_col).alias("vmin"), F.max(value_col).alias("vmax"))


def bucket_expr(value_col: str, n_buckets: int) -> Column:
    """Equal-width bucket index in [0, n_buckets) against the vmin/vmax
    columns supplied by :func:`value_bounds` (degenerate all-equal
    range collapses to bucket 0). BOTH edges clamp: above-vmax folds
    into the top bucket and below-vmin into bucket 0 — the lower clamp
    matters when the bounds come from a REFERENCE frame and the scored
    values from elsewhere (drift_monitor_stream): a downward shift
    must land its mass in the lowest bucket, where PSI sees it, not in
    a negative index the 0..n-1 grid join silently drops (exactly the
    drift the monitor exists to alarm on). On the batch query's
    shared-bounds path no value lies outside [vmin, vmax], so the
    clamp is a no-op there."""
    return (
        F.when(F.col("vmax") == F.col("vmin"), 0)
        .otherwise(
            F.greatest(
                F.least(
                    F.floor(
                        (F.col(value_col) - F.col("vmin"))
                        / ((F.col("vmax") - F.col("vmin")) / float(n_buckets))
                    ),
                    F.lit(n_buckets - 1),
                ),
                F.lit(0),
            )
        )
        .cast("int")
        .alias("bucket")
    )


def psi_from_counts(
    filled: DataFrame, key_col: str, n_buckets: int
) -> DataFrame:
    """PSI per key from a FULL-GRID (key, bucket, c0, c1) count frame
    (every bucket present, zeros included — join the grid before
    calling). Output ``(key, n_first, n_second, psi)`` with add-one
    smoothing and floor-half-up rounding to 6 dp. Each term
    (p−q)·ln(p/q) is nonnegative, so psi ≥ 0 and equal distributions
    score exactly 0."""
    w = Window.partitionBy(key_col)
    smoothed = filled.select(
        key_col,
        "c0",
        "c1",
        F.sum("c0").over(w).alias("n0"),
        F.sum("c1").over(w).alias("n1"),
    ).select(
        key_col,
        "n0",
        "n1",
        ((F.col("c0") + 1.0) / (F.col("n0") + float(n_buckets))).alias("p"),
        ((F.col("c1") + 1.0) / (F.col("n1") + float(n_buckets))).alias("q"),
    )
    return smoothed.groupBy(key_col).agg(
        F.max("n0").cast("long").alias("n_first"),
        F.max("n1").cast("long").alias("n_second"),
        F.expr("floor(sum((p - q) * ln(p / q)) * 1000000 + 0.5) / 1000000").alias(
            "psi"
        ),
    )


def reference_histogram(
    reference: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """The build-once artifact for streaming drift monitoring: the
    reference corpus's global (vmin, vmax) bounds and its per-(key,
    bucket) counts. Both frames are tiny (1 row; ≤ |keys|·buckets
    rows) — persist or save them and pass to
    :func:`streaming.jobs.drift_monitor_stream`, which then touches
    the reference corpus zero times per micro-batch."""
    bounds = value_bounds(reference, value_col)
    counts = (
        reference.select(key_col, value_col)
        .crossJoin(F.broadcast(bounds))
        .select(key_col, bucket_expr(value_col, n_buckets))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    return bounds, counts
