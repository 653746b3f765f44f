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


def _version_suffix(v: int) -> str:
    return "" if v == 0 else f"_v{v}"


def _fit_version_tables(
    spark: SparkSession, lm_dir: str, counted: DataFrame, new_v: int,
    smoothing: str,
) -> dict:
    """Write one version's count tables (bigrams + derived contexts,
    plus the KN continuation table) and return the derived manifest
    stats.  Everything derives from the ONE written bigram table —
    the tables can never disagree.  ``contexts`` carries both the
    context total ``c1`` and the distinct-successor count ``n1p``
    (the KN interpolation weight) regardless of smoothing: one agg,
    same shuffle, and a later smoothing switch needs no schema
    migration."""
    suf = _version_suffix(new_v)
    counted.write.mode("overwrite").parquet(f"{lm_dir}/bigrams{suf}")
    stored = spark.read.parquet(f"{lm_dir}/bigrams{suf}")
    stored.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.countDistinct("w2").alias("n1p")
    ).write.mode("overwrite").parquet(f"{lm_dir}/contexts{suf}")
    if smoothing == "kn":
        # continuation counts: in how many distinct contexts does w2
        # complete an n-gram — the KN insight (Kneser & Ney 1995; Chen
        # & Goodman 1999): "glasses" follows many contexts,
        # "Francisco" only one, however frequent the token itself is
        stored.groupBy("w2").agg(
            F.countDistinct("w1").alias("ccnt")
        ).write.mode("overwrite").parquet(f"{lm_dir}/continuation{suf}")
    row = stored.agg(
        F.countDistinct("w2").alias("v"),
        F.sum("c").alias("n"),
        F.count("*").alias("t"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("n2"),
    ).first()
    stats = {
        # +1 reserves unseen mass — a successor never observed
        # anywhere still gets α of it
        "vocab_size": int(row["v"] or 0) + 1,
        "n_bigrams": int(row["n"] or 0),
    }
    if smoothing == "kn":
        n1, n2 = int(row["n1"] or 0), int(row["n2"] or 0)
        stats["n_bigram_types"] = int(row["t"] or 0)
        # absolute discount, the standard count-of-counts estimate
        # D = n1/(n1 + 2·n2); degenerate corpora (no singletons) fall
        # back to 0.5
        stats["discount"] = n1 / (n1 + 2 * n2) if n1 > 0 else 0.5
    return stats


def _flip_manifest(lm_dir: str, meta: dict) -> None:
    tmp = os.path.join(lm_dir, _LM_MANIFEST + ".tmp")
    os.makedirs(lm_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(lm_dir, _LM_MANIFEST))  # THE commit


def _retire_versions(lm_dir: str, keep_from: int) -> None:
    """Remove every version's tables below ``keep_from`` (the
    previous version is retained for in-flight readers and retired by
    the NEXT flip — the refit retention rule)."""
    import shutil

    for v in range(keep_from):
        suf = _version_suffix(v)
        for t in ("bigrams", "contexts", "continuation"):
            shutil.rmtree(f"{lm_dir}/{t}{suf}", ignore_errors=True)


def train_ngram_lm(
    reference: DataFrame,
    lm_dir: str,
    alpha: float = 0.1,
    order: int = 2,
    smoothing: str = "addalpha",
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
    sized) count table — the KenLM trade CCNet makes at order 5.

    ``smoothing`` pins the probability model for the artifact's life:
    ``"addalpha"`` (the default) or ``"kn"`` — interpolated Kneser-Ney
    with an absolute discount estimated from the count-of-counts
    (CCNet's published gate is a KN-smoothed KenLM; Wenzek et al.
    2020).  Same stored count tables, one more derived table
    (continuation counts), same equi-join scoring shape.

    Rebuilding over an existing artifact is STAGED (round-9 advisor):
    the new tables land under a fresh version suffix and the atomic
    manifest flip is the commit — the old delete-first order left the
    live manifest pointing at rmtree'd dirs if a crash landed
    mid-rebuild.  ``last_epoch`` carries across the rebuild, so a
    streaming epoch replayed after it stays a no-op instead of
    double-counting."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    if smoothing not in ("addalpha", "kn"):
        raise ValueError(f"smoothing must be 'addalpha' or 'kn', got {smoothing!r}")
    prev = None
    try:
        prev = read_lm_manifest(lm_dir)
    except FileNotFoundError:
        pass
    new_v = int(prev.get("version", 0)) + 1 if prev is not None else 0
    spark = reference.sparkSession
    counted = (
        _doc_ngrams(reference, order)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    stats = _fit_version_tables(spark, lm_dir, counted, new_v, smoothing)
    meta = {
        "alpha": float(alpha),
        "order": int(order),
        "bos": BOS,
        "smoothing": smoothing,
        "version": new_v,
        **stats,
    }
    for carried in ("last_epoch", "epoch_checkpoint"):
        if prev is not None and carried in prev:
            meta[carried] = prev[carried]
    _flip_manifest(lm_dir, meta)
    _retire_versions(lm_dir, new_v - 1)


def _lm_paths(lm_dir: str, meta: dict):
    """Count-table paths for the manifest's committed version.  v0
    (the fresh build) lives at the bare names; updates and rebuilds
    land whole new tables under ``_v<N>`` suffixes and commit by the
    manifest flip — the DSIR counts-version construction, so readers
    see the old model in full until the flip and the new one in full
    after it."""
    suf = _version_suffix(int(meta.get("version", 0)))
    return f"{lm_dir}/bigrams{suf}", f"{lm_dir}/contexts{suf}"


def update_ngram_lm(
    spark: SparkSession,
    lm_dir: str,
    new_reference: DataFrame,
    epoch: int | None = None,
    checkpoint: str | None = None,
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
    the NEXT update.  KN artifacts re-derive their continuation counts
    and discount from the MERGED bigram table — distinct counts are
    not additive, but the table they derive from is, so update ≡
    retrain holds for every smoothing (tested).  ``checkpoint`` is the
    single-writer token (operators/ownership.py): a fold from a
    foreign checkpoint, or an unattributed manual fold against a
    sink-owned model, refuses loudly before touching any table."""
    from . import ownership

    meta = read_lm_manifest(lm_dir)
    if epoch is not None and meta.get("last_epoch", -1) >= epoch:
        return
    ownership.claim_writer(meta, checkpoint, f"n-gram LM at {lm_dir}")
    bi_path, _ = _lm_paths(lm_dir, meta)
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
    stats = _fit_version_tables(
        spark, lm_dir, merged, new_v, meta.get("smoothing", "addalpha")
    )
    meta.update({"version": new_v, **stats})
    if epoch is not None:
        meta["last_epoch"] = int(epoch)
    _flip_manifest(lm_dir, meta)
    _retire_versions(lm_dir, new_v - 1)


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
    arguments — the artifact is self-describing.  ``addalpha``
    artifacts score with the two-join add-α formula; ``kn`` artifacts
    add one more vocabulary-bounded equi-join (the continuation
    table) and score with interpolated Kneser-Ney:

        P(w2|w1) = max(c−D, 0)/c1 + D·n1p(w1)/c1 · P_cont(w2)   c1 > 0
                 = P_cont(w2)                                    c1 = 0
        P_cont(w2) = (ccnt(w2) + α) / (T + α·V)

    where T = |bigram types| and the α term reserves continuation
    mass for tokens never observed as a successor — the same
    unseen-mass rule as the add-α path, so both smoothers are proper
    and total-order-deterministic."""
    meta = read_lm_manifest(lm_dir)
    alpha, V = float(meta["alpha"]), int(meta["vocab_size"])
    bi_path, ctx_path = _lm_paths(lm_dir, meta)
    bi_counts = spark.read.parquet(bi_path)
    ctx_counts = spark.read.parquet(ctx_path)
    db = _doc_ngrams(documents, int(meta.get("order", 2)))
    joined = db.join(bi_counts, ["w1", "w2"], "left").join(
        ctx_counts.select("w1", "c1", *(
            ["n1p"] if meta.get("smoothing", "addalpha") == "kn" else []
        )),
        ["w1"],
        "left",
    )
    c = F.coalesce(F.col("c"), F.lit(0))
    c1 = F.coalesce(F.col("c1"), F.lit(0))
    if meta.get("smoothing", "addalpha") == "kn":
        D = float(meta["discount"])
        T = int(meta["n_bigram_types"])
        suf = _version_suffix(int(meta.get("version", 0)))
        cont = spark.read.parquet(f"{lm_dir}/continuation{suf}")
        joined = joined.join(cont, ["w2"], "left")
        pcont = (F.coalesce(F.col("ccnt"), F.lit(0)) + F.lit(alpha)) / F.lit(
            T + alpha * V
        )
        logp = F.log(
            F.when(
                c1 > 0,
                F.greatest(c - F.lit(D), F.lit(0.0)) / c1
                + F.lit(D) * F.col("n1p") / c1 * pcont,
            ).otherwise(pcont)
        )
    else:
        logp = F.log((c + F.lit(alpha)) / (c1 + F.lit(alpha * V)))
    scored = (
        joined.select("doc_id", logp.alias("logp"))
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
