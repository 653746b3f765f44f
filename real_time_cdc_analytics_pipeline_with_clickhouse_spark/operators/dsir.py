"""Data selection via importance resampling (DSIR) — Xie et al.,
NeurIPS 2023, "Data Selection for Language Models via Importance
Resampling": pick raw-corpus documents whose hashed-n-gram
distribution looks like a (small, high-quality) target corpus, by
sampling with probability proportional to the importance weight
p_target(doc) / p_raw(doc) under bag-of-hashed-n-grams unigram
models.  This is the selection rung between the heuristic gate
(``quality.quality_signals``) and the trained classifier
(``classifier.score_quality_from_model``): no labels, no training —
just two bucket histograms and one weighted pass over the corpus.

Spark-first shape, sized for the 100 TB raw side:

- Features reuse the classifier's ``feature_buckets`` (hashed
  unigrams + word bigrams, ``portable_hash64`` md5 buckets) so every
  number in this module is recomputable by DuckDB — the weights are
  oracle-twinned in tests/test_dsir.py.
- Each bucket model is ONE combinable aggregation whose result is
  bounded by ``n_buckets`` (the raw corpus reduces to ≤ n_buckets
  rows before anything joins); the log-ratio table is therefore
  always broadcastable, like classifier weights.
- Per-doc weights are map-side explode → broadcast log-ratio join →
  ONE doc-keyed combinable sum.  The raw corpus never shuffles its
  text.
- Selection is Gumbel top-k (the without-replacement sampling trick:
  argmax_k of logw/temperature + Gumbel noise samples ∝ w^(1/T)),
  with hash-derived noise so runs are deterministic and the oracle
  can replay them; the cut is ``orderBy().limit(k)`` →
  TakeOrderedAndProject (per-partition heaps, no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.scalar import portable_hash64
from .classifier import feature_buckets

# 2^52: portable_hash64 is 60-bit; mod 2^52 keeps every intermediate
# exactly representable as a double in BOTH engines (< 2^53), so the
# Gumbel noise is bit-identical under the DuckDB twin.
_U_MOD = 1 << 52


def hashed_ngram_counts(
    documents: DataFrame, n_buckets: int = 1024, seed: str = "dsir:"
) -> DataFrame:
    """(bucket, cnt) — occurrence counts of hashed unigram+bigram
    features over a corpus.  One combinable shuffle; the result is
    bounded by ``n_buckets`` regardless of corpus size."""
    return (
        documents.select(
            F.explode(feature_buckets(F.col("text"), n_buckets, seed)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_ratio(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = 1024,
    seed: str = "dsir:",
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, log_ratio) over the FULL bucket domain 0..n_buckets-1:
    ``ln p_target(b) − ln p_raw(b)`` under add-alpha smoothing
    (p(b) = (cnt_b + alpha) / (total + alpha·n_buckets)), so buckets
    unseen on either side stay finite and a doc can never score
    ±inf.  Exactly ``n_buckets`` rows — broadcastable by
    construction; the totals fold in with a window over that bounded
    table (never over a corpus)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 for finite smoothing, got {alpha}")
    spark = target.sparkSession
    dom = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    t = hashed_ngram_counts(target, n_buckets, seed).withColumnRenamed("cnt", "t_cnt")
    r = hashed_ngram_counts(raw, n_buckets, seed).withColumnRenamed("cnt", "r_cnt")
    j = (
        dom.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).cast("double").alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).cast("double").alias("r_cnt"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    denom = float(alpha) * n_buckets
    return j.select(
        "bucket",
        (
            F.log((F.col("t_cnt") + F.lit(float(alpha))) / (F.sum("t_cnt").over(w) + denom))
            - F.log((F.col("r_cnt") + F.lit(float(alpha))) / (F.sum("r_cnt").over(w) + denom))
        ).alias("log_ratio"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    seed: str = "dsir:",
    alpha: float = 1.0,
    log_ratio: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_feats, logw) — per-document log importance weight
    ``Σ_occurrences log_ratio(bucket)`` (the bag-of-hashed-n-grams
    log p_target/p_raw of the doc, additive over occurrences so no
    per-doc count vector ever materializes).  Docs whose text yields
    no features surface with logw = 0 (an empty bag is equally likely
    under both models) instead of vanishing.

    Pass a precomputed ``log_ratio`` to amortize the model across
    calls (e.g. scoring shards of the same raw corpus)."""
    if log_ratio is None:
        log_ratio = dsir_log_ratio(target, raw, n_buckets, seed, alpha)
    occ = raw.select(
        "doc_id",
        F.explode(feature_buckets(F.col("text"), n_buckets, seed)).alias("bucket"),
    )
    sums = (
        occ.join(F.broadcast(log_ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("log_ratio").alias("logw"), F.count("*").alias("n_feats"))
    )
    return raw.select("doc_id").join(sums, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("logw", F.lit(0.0)).alias("logw"),
    )


def gumbel_noise(doc_id: Column, seed: str = "dsir-g:") -> Column:
    """Deterministic standard-Gumbel noise per key: u = hash-uniform
    in (0,1), g = −ln(−ln u).  The +0.5/2^52 construction keeps u
    strictly inside (0,1) (never 0 or 1 → never ±inf) and exactly
    reproducible in DuckDB from the same md5 arithmetic."""
    u = (
        (portable_hash64(doc_id.cast("string"), seed=seed) % F.lit(_U_MOD)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_U_MOD))
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 1024,
    seed: str = "dsir:",
    alpha: float = 1.0,
    temperature: float | None = 1.0,
    gumbel_seed: str = "dsir-g:",
    log_ratio: DataFrame | None = None,
) -> DataFrame:
    """Select ``k`` raw documents by importance resampling: Gumbel
    top-k over ``logw / temperature`` draws a without-replacement
    sample with P(doc) ∝ w^(1/temperature) (Gumbel-max trick; T=1 is
    the DSIR paper's sampler, T→0 approaches deterministic top-k).
    ``temperature=None`` IS deterministic top-k by logw (ties broken
    by doc_id) — the greedy variant.

    Returns the selected rows with every raw column plus (logw,
    score).  The cut is a distributed top-k (TakeOrderedAndProject);
    the k survivors broadcast back onto the raw corpus, so the only
    corpus-sized work is the weight pass itself."""
    if k <= 0:
        raise ValueError(f"k must be >= 1, got {k}")
    if temperature is not None and temperature <= 0:
        raise ValueError(
            f"temperature must be > 0 (or None for deterministic top-k), got {temperature}"
        )
    w = dsir_weights(raw, target, n_buckets, seed, alpha, log_ratio=log_ratio)
    if temperature is None:
        score = F.col("logw")
    else:
        score = F.col("logw") / F.lit(float(temperature)) + gumbel_noise(
            F.col("doc_id"), seed=gumbel_seed
        )
    sel = (
        w.select("doc_id", "logw", score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
    return raw.join(F.broadcast(sel), "doc_id")
