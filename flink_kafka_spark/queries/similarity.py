"""Similarity-search query family (engine extension) on `embeddings`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine_topk_bruteforce, cosine_topk_ivf, cosine_topk_lsh
from ..tables import load
from . import Query

N_QUERY_VECS = 8
TOP_K = 10


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return cosine_topk_bruteforce(queries, emb, k=TOP_K)


ANN_TOPK_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) /
           (sqrt(list_sum(list_transform(range(1, 65), i -> q.v[i] * q.v[i]))) *
            sqrt(list_sum(list_transform(range(1, 65), i -> c.v[i] * c.v[i])))), 6) AS cosine
  FROM (SELECT * FROM v WHERE vec_id < {N_QUERY_VECS}) q
  CROSS JOIN v c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate variant: SRP-LSH bucketing (xxhash64-derived
    hyperplanes — not reproducible in DuckDB → rows-only check; the
    exact twin `ann_cosine_topk` carries the hash-checked oracle).

    4 planes + Hamming-1 multi-probe: the synthetic embeddings are
    near-uniform (true top-10 cosines ≈ 0.25-0.39), so narrow buckets
    would degenerate to sampling; on a corpus with genuine near-dups
    more planes prune harder at the same recall."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return cosine_topk_lsh(queries, emb, k=TOP_K, n_planes=4, probe_hamming=1)


def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF variant: KMeans coarse quantizer + nprobe cell probing
    (model-dependent cell assignment → rows-only check; recall vs the
    exact twin is pinned in tests/test_similarity.py)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return cosine_topk_ivf(queries, emb, k=TOP_K)


QUERIES = [
    Query("ann_cosine_topk", ann_cosine_topk, ANN_TOPK_ORACLE, "ext: brute-force ANN"),
    Query("ann_cosine_topk_lsh", ann_cosine_topk_lsh, None, "ext: SRP-LSH ANN"),
    Query("ann_cosine_topk_ivf", ann_cosine_topk_ivf, None, "ext: IVF ANN"),
]
