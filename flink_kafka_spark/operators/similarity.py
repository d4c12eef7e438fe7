"""Similarity search over embedding columns (engine extension).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors with sign-random-projection LSH so each query probes only its
bucket (recall < 1, tunable with more hyperplanes/probes). Both paths
compute the cosine JVM-side (zip_with/aggregate higher-order functions
— codegen'd, no Python, no UDF serialization).

Scale notes: brute force is a broadcast nested loop — fine when the
query set is small (queries broadcast, corpus scanned once); the LSH
variant turns it into an equi-join on bucket id, which shuffles each
corpus vector once regardless of query count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate(transform({v}, x -> x * x), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"


def _as_double(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias(out_vec),
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. The query side is
    broadcast; ranking is a per-query window (shuffle on query_id)."""
    q = _as_double(queries, id_col, vec_col, "query_id", "qv")
    c = _as_double(corpus, id_col, vec_col, "neighbor_id", "cv")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    f"({_DOT.format(a='qv', b='cv')}) / "
                    f"(({_NORM.format(v='qv')}) * ({_NORM.format(v='cv')}))"
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_bucket(df: DataFrame, id_col: str, vec_col: str, n_planes: int = 8) -> DataFrame:
    """Sign-random-projection bucket id: bit i = sign(v · h_i) where
    hyperplane h_i is a deterministic pseudo-random ±1 vector derived
    from xxhash64(i, dim-index) — reproducible across runs/engines with
    no stored model."""
    v = _as_double(df, id_col, vec_col, id_col, "v")
    bit_exprs = []
    for i in range(n_planes):
        proj = (
            f"aggregate(zip_with(v, sequence(0, size(v) - 1), "
            f"(x, j) -> x * (CAST(xxhash64(concat('{i}|', CAST(j AS STRING))) % 2 AS DOUBLE) * 2 + 1)), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        bit_exprs.append(f"(CASE WHEN ({proj}) >= 0 THEN {1 << i} ELSE 0 END)")
    return v.withColumn("bucket", F.expr(" + ".join(bit_exprs)))


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, equi-join on bucket,
    exact cosine + rank within the bucket's candidates."""
    q = srp_bucket(queries, id_col, vec_col, n_planes).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    c = srp_bucket(corpus, id_col, vec_col, n_planes).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), "bucket"
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    f"({_DOT.format(a='qv', b='cv')}) / "
                    f"(({_NORM.format(v='qv')}) * ({_NORM.format(v='cv')}))"
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
