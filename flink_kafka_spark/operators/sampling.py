"""Dataset sampling / splitting (engine extension: training-data
pipeline ops; the reference has no sampling surface).

Split assignment must be a pure function of the row id — never `rand()`
— so that re-running the pipeline (or running it on a different
cluster/partitioning) assigns every row to the same split. The mixer
is a Knuth multiplicative hash kept inside 63 bits so the identical
arithmetic runs on any ANSI SQL engine (oracle-checkable, no
engine-specific hash function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761  # 2^32 * golden ratio conjugate


def split_bucket_expr(id_col: str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): Knuth multiplicative mix
    of the integer id — identical formula expressible in plain SQL.

    The id is reduced mod 1000000007 BEFORE the multiply: a raw
    ``id * _KNUTH`` overflows int64 for ids ≥ ~3.47e9 (ANSI mode
    errors; non-ANSI wraps while a HUGEINT engine promotes — divergent
    buckets). ``pmod(id, p) * _KNUTH`` stays < 2^62 for any BIGINT id,
    and is identical to the unreduced form for ids < p."""
    return F.expr(
        f"pmod((pmod({id_col}, 1000000007) * {_KNUTH}L) % 1000000007, {n_buckets})"
    )


def split_bucket_sql(id_col: str, n_buckets: int = 100) -> str:
    """The DuckDB/ANSI twin of :func:`split_bucket_expr` (operands are
    non-negative after the inner reduction, so ``%`` == pmod)."""
    return f"(((({id_col} % 1000000007) * {_KNUTH}) % 1000000007) % {n_buckets})"


def train_val_test_split(
    df: DataFrame, id_col: str, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Assign train/val/test by deterministic bucket — a narrow
    projection (no shuffle, no state), stable across runs and
    partitionings."""
    b = split_bucket_expr(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): keeps ~fraction
    of each stratum. Seeded → deterministic for a fixed partitioning;
    for partitioning-independent sampling use a bucket threshold on
    :func:`split_bucket_expr` instead."""
    return df.sampleBy(stratum_col, fractions, seed)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    budget: int = 1024,
    n_shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document to the
    fixed-size context window (bin) its first token lands in, the way
    a pretraining pipeline concatenates a shard's documents and slices
    the stream into `budget`-token windows.

    Documents are first bucketed into deterministic hash shards (so the
    window sort never sees more than corpus/n_shards rows per
    partition — the scale knob), then ordered by id within the shard
    and run through a cumulative token sum:

        start_offset = cumsum(n_tokens) - n_tokens   (per shard)
        bin_id       = floor(start_offset / budget)

    One shuffle (by shard) + one in-partition sort; no state, no
    Python. Deterministic across runs and partitionings because both
    the shard and the order are pure functions of the id.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("shard", split_bucket_expr(id_col, n_shards))
        .withColumn("start_offset", F.sum(n_tokens_col).over(w) - F.col(n_tokens_col))
        .withColumn("bin_id", F.floor(F.col("start_offset") / budget))
        .select(id_col, "shard", n_tokens_col, "start_offset", "bin_id")
    )


def mixture_resample(
    df: DataFrame,
    weights: dict[str, int],
    budget_permille: int = 500,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    default_weight: int = 1,
) -> DataFrame:
    """Domain-mixture resampling under a token budget: mark which
    documents to keep so the kept corpus totals ~budget_permille/1000
    of the input tokens, distributed across sources in proportion to
    `weights` (a source → integer-weight map; unknown sources get
    `default_weight`), capped at each source's actual size.

    Mechanics: one tiny per-source aggregate (+ its grand total) is
    broadcast-joined back onto the corpus; each doc keeps iff its
    deterministic hash bucket (of 1e6) falls under the source's
    keep-threshold. Pure functions of (id, source) end-to-end — a
    re-run, a different partitioning, or an incremental top-up keeps
    exactly the same documents.

    Threshold math stays in BIGINT/DECIMAL(38,0) so any ANSI engine
    reproduces it bit-for-bit: per-source target tokens =
    grand * budget_permille/1000 * w/Σw, keep-threshold =
    min(1e6, floor(target * 1e6 / source_tokens)).
    """
    wsum = sum(weights.values()) or default_weight
    case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN {w}" for s, w in sorted(weights.items())
    ) + f" ELSE {default_weight} END"
    totals = df.groupBy(source_col).agg(F.sum(n_tokens_col).alias("src_tokens"))
    grand = totals.agg(F.sum("src_tokens").alias("grand_tokens"))
    thresholds = (
        totals.crossJoin(F.broadcast(grand))
        .withColumn("w", F.expr(case))
        .withColumn(
            "target_tokens",
            F.expr(
                f"CAST(floor(CAST(grand_tokens AS DECIMAL(38,0)) * {budget_permille} * w "
                f"/ ({wsum} * 1000)) AS BIGINT)"
            ),
        )
        .withColumn(
            "keep_thresh",
            F.expr(
                "least(1000000L, CAST(floor(CAST(target_tokens AS DECIMAL(38,0)) * 1000000 "
                "/ src_tokens) AS BIGINT))"
            ),
        )
        .select(source_col, "keep_thresh")
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .withColumn(
            "keep",
            (split_bucket_expr(id_col, 1_000_000) < F.col("keep_thresh")).cast("int"),
        )
        .select(id_col, source_col, n_tokens_col, "keep")
    )


def stratified_cap(
    df: DataFrame, strata_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Keep at most `k` rows per stratum, chosen by deterministic hash
    order of the id (NOT first-k-by-id, which would bias toward old
    rows). The balancing step for over-represented (lang, source)
    cells before mixing a training corpus.

    One shuffle (hash-partition by stratum) + per-stratum sort. The
    ORDER BY key is the 1e6-bucket Knuth hash with the raw id as
    tiebreak — a pure function of the id, so re-runs and repartitions
    keep the same rows. At extreme stratum sizes (≫ executor memory)
    swap the exact row_number for a two-pass threshold: sample the
    hash-bucket distribution, keep rows under the ~k-quantile bucket,
    then exact-trim the small remainder.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        split_bucket_expr(id_col, 1_000_000).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def export_shards(
    df: DataFrame, order_col: str, shard_size: int, n_parts: int | None = None
) -> DataFrame:
    """Assign contiguous 0-based global row numbers in `order_col`
    order and group them into fixed-size export shards — the final
    "write the corpus as N ordered shards" step of a dataset release.

    The naive `row_number() OVER (ORDER BY ...)` collapses the whole
    dataset into ONE partition (the anti-pattern tests/test_plans.py
    rejects). This is the scalable two-pass form:

      1. range-repartition on the order key, persist + count to PIN
         the partitioning (range sampling must not be recomputed
         between passes);
      2. per-partition counts -> driver cumsum (one tiny collect,
         #partitions rows) -> broadcast offsets;
      3. row_number within each range partition + its offset.

    Output is independent of the sampled range boundaries because the
    key's total order is; `order_col` must be unique (use a tiebreak
    composite otherwise).
    """
    from pyspark.sql.window import Window

    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    from ..caching import track

    parts = track(
        df.repartitionByRange(n_parts, F.col(order_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    parts.count()  # pin partition boundaries before the two reads
    sizes = sorted(
        (r._pid, r.n)
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in sizes:
        offsets.append((pid, acc))
        acc += n
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(F.col(order_col).asc())
    return (
        parts.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("global_rn", (F.col("_offset") + F.col("_rn") - 1).cast("bigint"))
        .withColumn(
            "shard_id", F.expr(f"CAST(floor(global_rn / {shard_size}) AS BIGINT)")
        )
        .drop("_pid", "_rn", "_offset")
    )


def shuffle_corpus(
    df: DataFrame, id_col: str = "doc_id", seed: int = 42, shard_size: int = 100
) -> DataFrame:
    """Deterministic global corpus shuffle: a pseudo-random but fully
    reproducible permutation of the corpus with contiguous positions
    and fixed-size shards — the "shuffle training order before
    packing/serving" step of a dataset release. Position is the rank
    of ``md5(seed|id)`` (ties broken by id), so re-runs on any
    partitioning, any cluster size, produce the identical permutation,
    and changing the seed is a fresh permutation.

    Scale design: the permutation key is a pure projection and the
    global rank reuses :func:`export_shards`'s two-pass range
    partition (sample boundaries, per-partition offsets) — never a
    single-partition window. One extra benefit at 100 TB: hash order
    is uniform by construction, so the range partitions are balanced
    no matter how skewed the input file order was.

    PRECONDITION: ``id_col`` values are NON-NULL (and unique — the
    export_shards rule). ``concat_ws`` skips NULL segments, so every
    NULL-id row would collapse onto the identical key md5(seed) and
    their relative positions become partitioning-dependent (and the
    DuckDB oracle's '||' yields NULL instead, diverging entirely).
    """
    # 32-hex-digit md5 then zero-padded id: fixed-width segments make
    # the composite's lexicographic order equal (md5, id) order on any
    # engine
    key = F.concat_ws(
        "|",
        F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),
    )
    return (
        export_shards(df.withColumn("_shuffle_key", key), "_shuffle_key", shard_size)
        .withColumnRenamed("global_rn", "position")
        .drop("_shuffle_key")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile (row count, nulls, distincts, min/max)
    in long form — the data-quality "describe" step before a corpus is
    admitted to training. min/max are cast to string so the schema is
    uniform across column types (int/string casts render identically
    on any engine; keep doubles out or format them explicitly).

    Single aggregation over one scan; multiple exact COUNT(DISTINCT)s
    compile to Spark's Expand strategy (input duplicated per distinct
    column — the exact-answer cost). At 100 TB swap in
    approx_count_distinct and keep the same output shape."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    stack = ", ".join(
        f"'{c}', _n - _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return df.agg(*aggs).select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_null, n_distinct, min_val, max_val)"
        ),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
