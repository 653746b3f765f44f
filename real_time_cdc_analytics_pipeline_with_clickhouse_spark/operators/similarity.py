"""Similarity search over embedding columns (north star).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; per-query ranking window.  The corpus
  side never shuffles — at 100 TB this is a map-side scan + per-query
  top-k heap (Spark's TakeOrderedAndProject analog per key).
- ``ivf_topk`` — IVF-style approximate variant: corpus pre-bucketed by
  sign-LSH (hyperoctants as deterministic "centroids"); a query probes
  only its own bucket.  Same answer shape, a fraction of the scoring
  work; recall tunable by multi-probing neighbor buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vector import cosine
from .dedup import sign_lsh_bucket


def default_queries(embeddings: DataFrame, every: int = 100) -> DataFrame:
    """Deterministic query subset: every ``every``-th vec_id."""
    return embeddings.where(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query by cosine (query ≠ neighbor)."""
    scored = embeddings.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("query_vec"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cos_sim", 4).alias("cos_sim"))
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5, bits: int = 6) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket."""
    corpus = embeddings.select(
        "vec_id", "embedding", sign_lsh_bucket(F.col("embedding"), bits).alias("bucket")
    )
    q = queries.select(
        "query_id", "query_vec", sign_lsh_bucket(F.col("query_vec"), bits).alias("bucket")
    )
    scored = corpus.join(F.broadcast(q), "bucket").where(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("query_vec"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.round("cos_sim", 4).alias("cos_sim"))
    )
