"""Distributed unigram-LM subword tokenizer — the SentencePiece
construction (Kudo 2018, "Subword Regularization"), trained over a
corpus too large for one machine.  The engine's second tokenizer
family next to BPE (operators/bpe.py): BPE grows a vocabulary bottom-up
by merges, the unigram model starts from a LARGE seed vocabulary and
prunes it down under an EM-fitted piece-probability model — the
tokenizer family the Llama/T5 lineage ships.

The scale shape is the same one that makes corpus-scale BPE tractable:
every statistic depends only on the WORD FREQUENCY table, not the raw
text.  One corpus pass aggregates (word, freq) — a single combinable
shuffle over the 100 TB side — and each EM iteration is an
Arrow-batched forward-backward over the DISTINCT-word table (Python
cost ∝ |vocabulary of the corpus|, never ∝ token count) followed by
one combinable piece-count aggregation.  The piece table itself is a
driver-bounded artifact (≤ seed_size rows, the same class as BPE's
merge table), so it broadcasts into the UDF closures.

Pinned semantics (mirrored exactly by the pure-Python reference in
tests/test_unigram.py — exactness for the oracle is chosen over
fidelity to SentencePiece's internal Bayesian/digamma refinements,
which are drop-in replacements inside the same data flow):

- words are the engine-wide normalized whitespace tokens
  (``functions.text.tokens``);
- the seed vocabulary is every substring of length ≤ ``max_piece_len``
  of the distinct words, scored by Σ freq(word) × occurrences
  (overlaps counted), truncated to the top ``seed_size`` by
  (score DESC, piece ASC) — plus EVERY single character present,
  which is never pruned (guarantees full coverage: any word of the
  training alphabet segments);
- initial piece probabilities are the normalized seed scores;
- one EM iteration: E-step computes each piece's EXPECTED count under
  the current probabilities by forward-backward over every word's
  segmentation lattice (freq-weighted); M-step renormalizes expected
  counts into probabilities (plain maximum likelihood, pinned);
- pruning rounds: after ``em_per_round`` EM iterations, drop the
  lowest-expected-count ``prune_frac`` of the multi-char pieces (ties
  prune lexicographically LARGEST first, so the kept set is
  deterministic), never below ``vocab_size``; repeat until the
  vocabulary reaches ``vocab_size``, then run a final ``em_per_round``
  iterations.  (SentencePiece prunes by likelihood-loss; the
  expected-count criterion is the documented simplification — same
  flow, one scoring expression apart.)
- encoding is Viterbi: the segmentation maximizing Σ log p(piece),
  ties broken by FEWER pieces then lexicographically smallest piece
  sequence — deterministic, and exactly reproducible by the test
  reference.

Artifact: ``save_unigram_model`` / ``load_unigram_model`` persist the
(piece, logprob, is_char) table + manifest — the frozen-artifact
contract every stored model in this engine follows (BPE, classifier,
IVF centroids): retraining writes a new dir, consumers are
deterministic against a load.

Reference parity note: the reference pipeline (ClickHouse CDC
analytics) has no tokenizer training — this module belongs to the
training-data-pipeline surface the engine adds on top (SURVEY.md §2's
LLM-ops extension), beside BPE, dedup and the LM quality gate.
"""

from __future__ import annotations

import math

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import tokens


def _word_freqs(documents: DataFrame) -> DataFrame:
    return (
        documents.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def seed_vocabulary(
    documents: DataFrame, max_piece_len: int = 6, seed_size: int = 2000
) -> DataFrame:
    """(piece, score, is_char) seed table — every substring of length
    ≤ ``max_piece_len`` of the distinct words, scored by
    Σ freq × occurrences, truncated to ``seed_size`` multi-char pieces
    by (score DESC, piece ASC); all single characters present are
    appended unconditionally (coverage guarantee, exempt from both the
    truncation and every later prune).

    One exploded substring aggregation over the DISTINCT-word table:
    a word of length L yields ≤ L × max_piece_len rows, and the word
    table is corpus-vocabulary-sized — the 100 TB corpus itself is
    touched only by the one (word, freq) shuffle."""
    wf = _word_freqs(documents)
    # substrings via a JVM-side sequence comprehension — no Python in
    # the seed pass
    subs = wf.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.length("word"), F.lit(int(max_piece_len)))),
                    lambda ln: F.transform(
                        F.sequence(F.lit(1), F.length("word") - ln + 1),
                        lambda st: F.substring(F.col("word"), st, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    scored = subs.groupBy("piece").agg(F.sum("freq").alias("score"))
    chars = scored.where(F.length("piece") == 1).withColumn("is_char", F.lit(True))
    multi = (
        scored.where(F.length("piece") > 1)
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(int(seed_size))
        .withColumn("is_char", F.lit(False))
    )
    return multi.unionByName(chars).select("piece", "score", "is_char")


def _forward_backward(word: str, probs: dict, max_len: int) -> dict:
    """Expected piece counts of ONE word under the current model —
    shared by the E-step pandas UDF and the test reference.  Standard
    lattice forward-backward: alpha[i] = Σ alpha[j]·p(word[j:i]),
    expected(piece@(j,i)) = alpha[j]·p·beta[i] / alpha[n]."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_len), i):
            p = probs.get(word[j:i])
            if p:
                a += alpha[j] * p
        alpha[i] = a
    if alpha[n] <= 0.0:
        return {}  # unreachable when every char is in the vocab
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        b = 0.0
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = probs.get(word[i:j])
            if p:
                b += p * beta[j]
        beta[i] = b
    out: dict = {}
    z = alpha[n]
    for j in range(n):
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            p = probs.get(piece)
            if p:
                e = alpha[j] * p * beta[i] / z
                if e > 0.0:
                    out[piece] = out.get(piece, 0.0) + e
    return out


def _em_iteration(word_freqs: DataFrame, probs: dict, max_len: int) -> DataFrame:
    """One E-step over the distinct-word table: (piece, expected) —
    Arrow-batched lattice forward-backward with the (driver-bounded)
    piece table in the closure, then ONE combinable aggregation."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("map<string,double>")
    def estep(words: pd.Series, freqs: pd.Series) -> pd.Series:
        out = []
        for w, f in zip(words, freqs):
            e = _forward_backward(w, probs, max_len)
            out.append({k: v * float(f) for k, v in e.items()})
        return pd.Series(out)

    exploded = word_freqs.select(
        F.explode(estep("word", "freq")).alias("piece", "e")
    )
    return exploded.groupBy("piece").agg(F.sum("e").alias("expected"))


def train_unigram(
    documents: DataFrame,
    vocab_size: int = 400,
    max_piece_len: int = 6,
    seed_size: int = 2000,
    em_per_round: int = 2,
    prune_frac: float = 0.2,
) -> DataFrame:
    """Train the unigram-LM tokenizer; returns the final
    (piece, logprob, is_char) vocabulary (≥ vocab_size rows — single
    chars are kept even when they push past the target; ln-space
    probabilities, normalized).

    Driver loop shape (the ``train_bpe`` discipline): the corpus pays
    ONE (word, freq) shuffle + one seed-substring aggregation; each EM
    iteration is one Arrow-batched pass over the distinct-word table +
    one combinable agg, with the piece probabilities collected to the
    driver between iterations (the piece table is ≤ seed_size rows —
    a bounded artifact, same class as the BPE merge table).  Round
    count is O(log(seed/vocab) / log(1/(1-prune_frac))) — a dozen
    bounded Spark jobs, never a loop over corpus rows."""
    wf = _word_freqs(documents).persist()
    try:
        seed = seed_vocabulary(documents, max_piece_len, seed_size)
        rows = sorted(seed.collect(), key=lambda r: r["piece"])
        chars = {r["piece"] for r in rows if r["is_char"]}
        total = sum(float(r["score"]) for r in rows)
        probs = {r["piece"]: float(r["score"]) / total for r in rows}

        def run_em(k: int) -> None:
            nonlocal probs
            for _ in range(k):
                # expected counts ROUND to 12 significant digits before
                # the M-step (pinned semantics): a distributed double
                # sum is summation-order-dependent in its last bits,
                # and un-rounded counts would let partition scheduling
                # flip prune-order ties — this way train-twice is
                # bit-identical and the pure-Python reference can
                # mirror the arithmetic exactly
                counts = {
                    r["piece"]: float(f"{float(r['expected']):.12e}")
                    for r in sorted(
                        _em_iteration(wf, probs, max_piece_len).collect(),
                        key=lambda r: r["piece"],
                    )
                }
                # driver-side scalar sums run in sorted-piece order
                # (pinned): with the rounding above this makes the
                # whole trainer bit-deterministic run-to-run and
                # exactly mirrorable by the test reference
                z = sum(counts[p] for p in sorted(counts))
                # pieces with zero expectancy drop out of the model
                # unless they are coverage chars (kept at a floor so
                # the lattice never disconnects)
                floor = 1e-12
                nxt = {p: counts[p] / z for p in sorted(counts) if counts[p] > 0.0}
                for c in chars:
                    nxt.setdefault(c, floor)
                probs = nxt

        run_em(em_per_round)
        while sum(1 for p in probs if p not in chars) + len(chars) > vocab_size:
            # prune order: expected probability ASC, piece DESC within
            # ties (two-pass stable sort — the exact rule the pure-
            # Python reference mirrors)
            multi = sorted(
                ((p, v) for p, v in probs.items() if p not in chars),
                key=lambda kv: kv[0],
                reverse=True,
            )
            multi.sort(key=lambda kv: kv[1])
            if not multi:
                break  # vocab_size below the char count — chars win
            surplus = len(multi) + len(chars) - vocab_size
            n_drop = max(1, min(surplus, int(len(multi) * prune_frac)))
            for p, _v in multi[:n_drop]:
                del probs[p]
            z = sum(probs[p] for p in sorted(probs))
            probs = {p: probs[p] / z for p in sorted(probs)}
            run_em(em_per_round)
        run_em(em_per_round)

        spark = documents.sparkSession
        out = [
            (p, math.log(v), p in chars)
            for p, v in sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))
        ]
        return spark.createDataFrame(
            out, "piece string, logprob double, is_char boolean"
        )
    finally:
        wf.unpersist()


def _viterbi_word(word: str, logp: dict, max_len: int) -> list[str]:
    """Best segmentation of one word: max Σ logprob, ties → fewer
    pieces, then lexicographically smallest piece sequence — shared by
    the encode pandas UDF and the test reference."""
    n = len(word)
    # best[i] = (score, n_pieces, pieces tuple) ending at i
    best: list = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            s = (best[j][0] + lp, -(best[j][1] + 1))
            c = (s[0], s[1], best[j][2] + (word[j:i],))
            if (
                cand is None
                or c[0] > cand[0] + 1e-12
                or (abs(c[0] - cand[0]) <= 1e-12 and c[1] > cand[1])
                or (
                    abs(c[0] - cand[0]) <= 1e-12
                    and c[1] == cand[1]
                    and c[2] < cand[2]
                )
            ):
                cand = c
        best[i] = cand
    if best[n] is None:
        # defense in depth — cannot happen when the word's chars are
        # all in the vocab (the coverage guarantee)
        return list(word)
    return list(best[n][2])


def unigram_encode(documents: DataFrame, vocab: DataFrame) -> DataFrame:
    """Encode every document into unigram pieces — (doc_id, pieces
    array<string>, n_pieces).  Same scale shape as ``bpe_encode``:
    the vocabulary is driver-bounded and rides the closure, Python
    runs only over DISTINCT words (Arrow-batched), the corpus side
    pays one join + one doc-keyed order-restoring reassembly.  Piece
    concatenation reproduces each word exactly (round-trip tested)."""
    from pyspark.sql.functions import pandas_udf

    logp = {r["piece"]: float(r["logprob"]) for r in vocab.collect()}
    max_len = max((len(p) for p in logp), default=1)

    @pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _viterbi_word(w, logp, max_len))

    toks = documents.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "word")
    ).where(F.col("word") != "")
    wv = toks.select("word").distinct().withColumn("pieces", enc("word"))
    encoded = (
        toks.join(wv, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("pos").alias("i"), F.col("pieces").alias("p"))
                        )
                    ),
                    lambda x: x["p"],
                )
            ).alias("pieces")
        )
    )
    return (
        documents.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pieces", F.array().cast("array<string>")).alias("pieces"),
            F.coalesce(F.size("pieces"), F.lit(0)).alias("n_pieces"),
        )
    )


def unigram_vocab_ids(vocab: DataFrame) -> DataFrame:
    """The CLOSED id table — (token_id, piece, logprob, is_char), ids
    1..N in (logprob DESC, piece ASC) order (the training output's own
    deterministic order), id 0 reserved for the defensive OOV path —
    the ``bpe_vocab`` contract for the unigram family."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("logprob").desc(), F.col("piece").asc())
    return vocab.select(
        F.row_number().over(w).cast("int").alias("token_id"),
        "piece",
        "logprob",
        "is_char",
    )


def prepare_unigram_encoder(vocab: DataFrame):
    """Collect the driver-bounded (≤ vocab_size) id/logprob maps ONCE —
    the id assignment is ``unigram_vocab_ids``'s.  A streaming encode
    sink holds the returned token in state so each micro-batch pays
    only the encode jobs, never the single-partition id window + full
    vocab collect again."""
    rows = unigram_vocab_ids(vocab).collect()
    logp = {r["piece"]: float(r["logprob"]) for r in rows}
    ids = {r["piece"]: int(r["token_id"]) for r in rows}
    max_len = max((len(p) for p in logp), default=1)
    return logp, ids, max_len


def unigram_encode_ids(
    documents: DataFrame, vocab: DataFrame | None = None, prepared=None
) -> DataFrame:
    """``unigram_encode`` straight to model-ready ids — (doc_id,
    token_ids array<int>, n_pieces).  Pass either the vocab frame (the
    maps collect per call) or a ``prepare_unigram_encoder`` token (the
    per-run fast path)."""
    from pyspark.sql.functions import pandas_udf

    if prepared is None:
        if vocab is None:
            raise ValueError("unigram_encode_ids needs vocab or prepared")
        prepared = prepare_unigram_encoder(vocab)
    logp, ids, max_len = prepared

    @pandas_udf("array<int>")
    def enc(col: pd.Series) -> pd.Series:
        return col.map(
            lambda w: [ids.get(p, 0) for p in _viterbi_word(w, logp, max_len)]
        )

    toks = documents.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "word")
    ).where(F.col("word") != "")
    wv = toks.select("word").distinct().withColumn("wids", enc("word"))
    encoded = (
        toks.join(wv, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("pos").alias("i"), F.col("wids").alias("p"))
                        )
                    ),
                    lambda x: x["p"],
                )
            ).alias("token_ids")
        )
    )
    return (
        documents.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("token_ids", F.array().cast("array<int>")).alias("token_ids"),
            F.coalesce(F.size("token_ids"), F.lit(0)).alias("n_pieces"),
        )
    )


_MANIFEST = "_unigram_manifest.json"


def save_unigram_model(vocab: DataFrame, model_dir: str, params: dict | None = None) -> None:
    """Persist a trained unigram tokenizer (vocab parquet + manifest)
    — the frozen-artifact contract (retrain = new dir)."""
    import json
    import os

    vocab.coalesce(1).write.mode("overwrite").parquet(f"{model_dir}/vocab")
    meta = {"vocab_size": vocab.count(), "family": "unigram"}
    if params:
        meta.update(params)
    tmp = os.path.join(model_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(model_dir, _MANIFEST))


def load_unigram_model(spark, model_dir: str) -> tuple[DataFrame, dict]:
    """(vocab, manifest) of a saved tokenizer; loud when absent."""
    import json
    import os

    p = os.path.join(model_dir, _MANIFEST)
    if not os.path.isfile(p):
        raise FileNotFoundError(
            f"no unigram model at {model_dir} — run train_unigram + "
            "save_unigram_model first"
        )
    with open(p) as fh:
        meta = json.load(fh)
    return spark.read.parquet(f"{model_dir}/vocab"), meta
