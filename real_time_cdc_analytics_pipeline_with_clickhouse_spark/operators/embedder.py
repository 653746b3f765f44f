"""Deterministic text embedding via feature hashing — the bridge
from raw documents to the engine's vector stack (sign-LSH near-dup,
IVF/PQ indexes, SemDeDup, hybrid retrieval) with no external model:
the hashing-trick bag-of-tokens embedder (Weinberger et al., ICML
2009, "Feature Hashing for Large Scale Multitask Learning") — each
token occurrence adds ±1 to one of ``dim`` buckets (bucket and sign
both md5-derived), then L2 normalization.  Exact duplicates embed
identically, token-multiset near-duplicates embed nearby — precisely
the geometry the downstream semantic-dedup operators assume.

This is a *baseline* embedder, not a stand-in for a learned one: the
point is that the WHOLE document → vector → index → dedup/search
chain runs end-to-end inside the engine, testably (every number is
recomputable by DuckDB via ``portable_hash64``).  Swapping in learned
vectors is a drop-in column replacement.

Scale shape: tokenize/explode is map-side; the only shuffles are two
doc-keyed combinable aggregations over (doc_id, bucket) pairs — the
text itself never shuffles, and no row ever materializes more than
its own ``dim``-length array.  No Python in the plan.  Wall-clock is
dominated by the two md5 evaluations per token occurrence that buy
DuckDB portability (``portable_hash64``); ``hash_mode="xxh64"``
swaps in Spark's native xxhash64 for the same geometry at a fraction
of the hash cost (production mode — no DuckDB twin, invariant-tested
instead; the ``_scale10x_embed_documents_xxh`` bench probe records
the gap).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.scalar import portable_hash64
from ..functions.text import tokens

EMB_SEED_BUCKET = "emb:b:"
EMB_SEED_SIGN = "emb:s:"


def embed_documents(
    documents: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    out_id_col: str = "vec_id",
    hash_mode: str = "md5",
) -> DataFrame:
    """(vec_id, embedding array<float>, n_tokens) — hashed bag-of-
    tokens embeddings, unit L2 norm for any doc with ≥1 token.
    Column names default to the ``embeddings`` table's contract so
    the output feeds ``build_ivf_index`` / ``embedding_near_dup_pairs``
    / ``semantic_dedup_keep`` unchanged.

    Tokenless documents surface as the ZERO vector (norm 0, cosine 0
    against everything) rather than vanishing — same survival rule as
    the quality scorer; filter on ``n_tokens > 0`` before indexing if
    zero vectors are unwanted."""
    if dim <= 0:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from ..functions.text import doc_token_col

    toks = documents.select(
        F.col(id_col).alias(out_id_col),
        F.explode(F.filter(doc_token_col(documents), lambda x: x != "")).alias("term"),
    )
    occ = toks.select(
        out_id_col,
        (portable_hash64(F.col("term"), seed=EMB_SEED_BUCKET, mode=hash_mode) % dim)
        .cast("int")
        .alias("bucket"),
        F.when(
            portable_hash64(F.col("term"), seed=EMB_SEED_SIGN, mode=hash_mode) % 2
            == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("sign"),
    )
    sparse = (
        occ.groupBy(out_id_col, "bucket")
        .agg(F.sum("sign").alias("v"), F.count("*").alias("n"))
        .groupBy(out_id_col)
        .agg(
            F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("m"),
            F.sum("n").alias("n_tokens"),
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)),
    )
    # bind the dense array, then its norm, as higher-order-function
    # INPUTS (the shingles trick) so each is evaluated once per row,
    # not once per element
    unit = F.element_at(
        F.transform(
            F.array(dense),
            lambda d: F.element_at(
                F.transform(
                    F.array(
                        F.sqrt(F.aggregate(d, F.lit(0.0), lambda a, x: a + x * x))
                    ),
                    lambda nr: F.transform(
                        d,
                        lambda x: (
                            x / F.when(nr > 0, nr).otherwise(F.lit(1.0))
                        ).cast("float"),
                    ),
                ),
                1,
            ),
        ),
        1,
    )
    embedded = sparse.select(out_id_col, unit.alias("embedding"), "n_tokens")
    return (
        documents.select(F.col(id_col).alias(out_id_col))
        .join(embedded, out_id_col, "left")
        .select(
            out_id_col,
            F.coalesce(
                "embedding",
                F.array_repeat(F.lit(0.0).cast("float"), dim),
            ).alias("embedding"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )
