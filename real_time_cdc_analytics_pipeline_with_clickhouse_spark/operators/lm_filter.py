"""N-gram language-model perplexity filtering — the CCNet-style
quality gate (Wenzek et al., LREC 2020: score web text by the
perplexity of a language model trained on a trusted reference corpus;
keep the low-perplexity head).  The heuristic quality signals
(quality.py) and the trained classifier (classifier.py) judge a
document by its own surface statistics; this gate judges it by how
well a REFERENCE DISTRIBUTION predicts it — the standard third rung of
a pretraining quality stack.

The model is an add-α-smoothed bigram LM over the engine's canonical
tokenizer, stored as a plain parquet artifact:

- ``bigrams``   (w1, w2, c)  — corpus bigram counts (vocabulary-
  bounded: |distinct bigrams|, never corpus-sized);
- ``contexts``  (w1, c1)     — context totals, derived FROM the bigram
  table (c1(w) = Σ_w2 c(w, w2)) so the two tables can never disagree;
- ``_lm_manifest.json``      — pins (alpha, vocab_size V, n) for the
  artifact's lifetime; scoring resolves from it (the
  DSIR/LSH-manifest discipline — a doc scored under different
  smoothing than the stored counts would be silently miscalibrated).

Scoring: for each document bigram (w1, w2),

    logp = ln( (c(w1,w2) + α) / (c1(w1) + α·V) )

(unseen bigrams and unseen contexts fall out of the same formula with
c = 0 / c1 = 0 — no special cases), and

    ppl(doc) = exp( − mean logp ).

Scale shape (100 TB stance): training is tokenize → explode → ONE
combinable groupBy (the BPE word-frequency shape); scoring is two
equi-joins of the exploded document bigrams against the
vocabulary-bounded count tables (keyed on the bigram / the context —
plain shuffle joins, correct at any corpus size; Catalyst broadcasts
them when the reference is small) plus one per-doc combinable
aggregation.  Everything is JVM-side; the tokenizer honors the
one-tokenize ``TOKENS_COL`` contract.  Exactly mirrored by a DuckDB
twin in tests/test_lm_filter.py.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.text import doc_token_col

_LM_MANIFEST = "_lm_manifest.json"
# sentence-start marker: outside the tokenizer's [a-z0-9] alphabet, so
# it can never collide with a real token
BOS = "^"


def _doc_ngrams(
    documents: DataFrame, order: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2) — one row per ``order``-gram of the BOS-padded
    token stream, split as (context = the first order−1 tokens joined
    with spaces, next = the last token).  The stream is prefixed with
    order−1 BOS markers (standard padding: the first real token is
    conditioned on a pure-BOS context), so empty/tokenless docs yield
    no rows.  Built on ``shingles_from_tokens`` (already empty-guarded)
    with the padded sequence BOUND as a higher-order-function input,
    so the token expression evaluates once per row — the
    shingles-module trick; referencing it inside the per-element
    lambda would re-run normalize+split per element.  Tokens contain
    no spaces (the tokenizer's alphabet is [a-z0-9]), so the
    space-joined shingle splits back losslessly."""
    from ..functions.text import shingles_from_tokens

    toks = F.filter(doc_token_col(documents), lambda x: x != "")
    pad = F.array(*[F.lit(BOS)] * (order - 1))
    seq = F.concat(pad, toks)
    grams = F.element_at(
        F.transform(F.array(seq), lambda s: shingles_from_tokens(s, order)), 1
    )
    return (
        documents.select(F.col(id_col).alias("_id"), grams.alias("g"))
        .select("_id", F.explode("g").alias("gram"))
        .select(
            F.col("_id").alias(id_col),
            F.substring_index(F.col("gram"), " ", order - 1).alias("w1"),
            F.substring_index(F.col("gram"), " ", -1).alias("w2"),
        )
    )


def train_ngram_lm(
    reference: DataFrame, lm_dir: str, alpha: float = 0.1, order: int = 2
) -> None:
    """Fit the ``order``-gram LM on the trusted reference corpus and
    persist it.  ONE corpus-wide shuffle (the n-gram count groupBy —
    the only corpus-sized work); the context table and the manifest
    stats derive from the counted table, never from a second corpus
    pass.  ``order`` is pinned in the manifest (scoring and
    incremental updates resolve it — a batch counted at a different
    order would corrupt the context space); order 2 is the default,
    higher orders sharpen the gate at the cost of a larger (still
    vocabulary^order-bounded, realistically corpus-distinct-n-gram-
    sized) count table — the KenLM trade CCNet makes at order 5."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    import glob as _glob
    import shutil

    # a rebuild supersedes incremental history: clear versioned count
    # tables so the reset-to-v0 manifest can never coexist with stale
    # _v dirs (the build_minhash_index stale-tombstone rule)
    for d in _glob.glob(f"{lm_dir}/bigrams_v*") + _glob.glob(f"{lm_dir}/contexts_v*"):
        shutil.rmtree(d, ignore_errors=True)
    spark = reference.sparkSession
    bi = (
        _doc_ngrams(reference, order)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    bi.write.mode("overwrite").parquet(f"{lm_dir}/bigrams")
    stored = spark.read.parquet(f"{lm_dir}/bigrams")
    ctx = stored.groupBy("w1").agg(F.sum("c").alias("c1"))
    ctx.write.mode("overwrite").parquet(f"{lm_dir}/contexts")
    # V = |distinct successor vocabulary| + 1 (the +1 reserves unseen
    # mass — a successor never observed anywhere still gets α of it);
    # ONE small agg over the already-counted table
    row = stored.agg(
        F.countDistinct("w2").alias("v"), F.sum("c").alias("n")
    ).first()
    meta = {
        "alpha": float(alpha),
        "vocab_size": int(row["v"] or 0) + 1,
        "n_bigrams": int(row["n"] or 0),
        "order": int(order),
        "bos": BOS,
    }
    tmp = os.path.join(lm_dir, _LM_MANIFEST + ".tmp")
    os.makedirs(lm_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(lm_dir, _LM_MANIFEST))


def _lm_paths(lm_dir: str, meta: dict):
    """Count-table paths for the manifest's committed version.  v0
    (the fresh build) lives at the bare names; incremental updates
    land whole new tables under ``_v<N>`` suffixes and commit by the
    manifest flip — the DSIR counts-version construction, so readers
    see the old model in full until the flip and the new one in full
    after it."""
    v = int(meta.get("version", 0))
    suf = "" if v == 0 else f"_v{v}"
    return f"{lm_dir}/bigrams{suf}", f"{lm_dir}/contexts{suf}"


def update_ngram_lm(
    spark: SparkSession,
    lm_dir: str,
    new_reference: DataFrame,
    epoch: int | None = None,
) -> None:
    """Fold new reference documents into the stored LM ADDITIVELY —
    bigram counts are pure sums, so the updated model is EXACTLY the
    one a from-scratch retrain on the unioned corpora would produce
    (tested integer identity).  Cost ∝ batch (the batch's own bigram
    groupBy) + the vocabulary-bounded merge with the stored table —
    never a history rescan.

    Exactly-once for streaming callers: ``epoch`` stamps
    ``last_epoch`` IN the same manifest flip that commits the counts,
    so a replayed epoch ≤ the stamp is a no-op and a crash between the
    counts write and the flip refolds from the still-live previous
    version (the engine's standard two-layer contract).  The previous
    version's tables are retained for in-flight readers and retired by
    the NEXT update."""
    import shutil

    meta = read_lm_manifest(lm_dir)
    if epoch is not None and meta.get("last_epoch", -1) >= epoch:
        return
    bi_path, ctx_path = _lm_paths(lm_dir, meta)
    batch = (
        _doc_ngrams(new_reference, int(meta.get("order", 2)))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    merged = (
        spark.read.parquet(bi_path)
        .unionByName(batch)
        .groupBy("w1", "w2")
        .agg(F.sum("c").alias("c"))
    )
    new_v = int(meta.get("version", 0)) + 1
    new_bi = f"{lm_dir}/bigrams_v{new_v}"
    merged.write.mode("overwrite").parquet(new_bi)
    stored = spark.read.parquet(new_bi)
    stored.groupBy("w1").agg(F.sum("c").alias("c1")).write.mode(
        "overwrite"
    ).parquet(f"{lm_dir}/contexts_v{new_v}")
    row = stored.agg(F.countDistinct("w2").alias("v"), F.sum("c").alias("n")).first()
    meta.update(
        {
            "version": new_v,
            "vocab_size": int(row["v"] or 0) + 1,
            "n_bigrams": int(row["n"] or 0),
        }
    )
    if epoch is not None:
        meta["last_epoch"] = int(epoch)
    tmp = os.path.join(lm_dir, _LM_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(lm_dir, _LM_MANIFEST))  # THE commit
    # retire everything older than the previous version (kept for
    # in-flight readers — the refit retention rule)
    for v in range(new_v - 1):
        suf = "" if v == 0 else f"_v{v}"
        shutil.rmtree(f"{lm_dir}/bigrams{suf}", ignore_errors=True)
        shutil.rmtree(f"{lm_dir}/contexts{suf}", ignore_errors=True)


def read_lm_manifest(lm_dir: str) -> dict:
    p = os.path.join(lm_dir, _LM_MANIFEST)
    if not os.path.isfile(p):
        raise FileNotFoundError(
            f"no n-gram LM at {lm_dir} — run train_ngram_lm first"
        )
    with open(p) as fh:
        return json.load(fh)


def perplexity_score(
    spark: SparkSession, documents: DataFrame, lm_dir: str
) -> DataFrame:
    """(doc_id, n_bigrams, ppl) — every input doc_id survives;
    tokenless documents carry ``n_bigrams = 0`` and a NULL ``ppl``
    (they have no evidence either way — let the caller's policy
    decide, exactly the quality-scorer survival rule).

    Smoothing parameters come from the MANIFEST, never from caller
    arguments — the artifact is self-describing."""
    meta = read_lm_manifest(lm_dir)
    alpha, V = float(meta["alpha"]), int(meta["vocab_size"])
    bi_path, ctx_path = _lm_paths(lm_dir, meta)
    bi_counts = spark.read.parquet(bi_path)
    ctx_counts = spark.read.parquet(ctx_path)
    db = _doc_ngrams(documents, int(meta.get("order", 2)))
    scored = (
        db.join(bi_counts, ["w1", "w2"], "left")
        .join(ctx_counts, ["w1"], "left")
        .select(
            "doc_id",
            (
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha * V))
                )
            ).alias("logp"),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.avg("logp").alias("_mean"))
        .select("doc_id", "n_bigrams", F.exp(-F.col("_mean")).alias("ppl"))
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "ppl",
        )
    )


def perplexity_filter(
    spark: SparkSession,
    documents: DataFrame,
    lm_dir: str,
    max_ppl: float,
    keep_tokenless: bool = False,
) -> DataFrame:
    """Keep documents the reference LM predicts well (``ppl ≤
    max_ppl``) — the CCNet head/tail cut with an explicit threshold.
    ``keep_tokenless`` routes the no-evidence docs (NULL ppl)."""
    scores = perplexity_score(spark, documents, lm_dir)
    keep = scores.where(
        (F.col("ppl") <= float(max_ppl))
        | (F.lit(bool(keep_tokenless)) & F.col("ppl").isNull())
    ).select("doc_id")
    return documents.join(keep, "doc_id", "left_semi")
