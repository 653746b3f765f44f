"""Corpus quality scoring and PII redaction (LLM-data-pipeline ops).

Two first-class pre-training data-prep stages the reference's warehouse
layer has no analog for, designed 100 TB-first:

- ``quality_signals``: Gopher-style per-document repetition / quality
  heuristics (published in Rae et al. 2021, "Scaling Language Models" —
  the public filtering recipe).  Token-histogram metrics come from one
  explode → two-level partial aggregation (map-side combinable, keyed
  by (doc_id, term) then doc_id); the bigram-repetition metrics are
  pure array expressions on the scan.  The only shuffle-join is
  doc_id ⋈ doc_id between the scan and its own histogram — AQE picks
  the strategy, nothing corpus-proportional is ever broadcast.
- ``pii_redact``: regex scrubbing (emails / phone numbers / IPv4) as
  pure ``regexp_count`` + ``regexp_replace`` expressions — entirely
  map-side, a free column at any scale.

No Python UDFs anywhere; every expression is JVM-side and
whole-stage-codegen'd.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text import shingles, tokens

# ---------------------------------------------------------------------------
# Gopher-style quality signals
# ---------------------------------------------------------------------------

# Default thresholds: tuned so the driver's synthetic word-soup corpus
# splits both ways (real corpora would tune per source, as the paper
# does).  All metrics are rounded to 6dp before thresholding so the
# flag is bit-stable cross-engine.
MIN_TOKENS = 20
MIN_DISTINCT_RATIO = 0.4
MAX_TOP_TOKEN_FRAC = 0.12
MAX_DUP_BIGRAM_FRAC = 0.06
MEAN_WORD_LEN_RANGE = (3.0, 10.0)


def quality_signals(documents: DataFrame) -> DataFrame:
    """Per-document repetition/quality metrics + a keep/drop flag.

    Columns: ``n_tokens`` (non-empty whitespace tokens),
    ``distinct_ratio`` (type/token ratio), ``top_token_frac`` (share of
    the single most frequent token), ``dup_bigram_frac`` (fraction of
    word bigrams that are repeats — the Gopher "duplicate n-gram"
    signal), ``mean_word_len``, and ``quality_ok``.

    Plan shape: scan → explode(term) → partial-agg (doc_id, term) →
    partial-agg (doc_id) → equi-join back to the scan's array-expr
    projection on doc_id.  Both aggregations are additive (combinable
    map-side); the join is doc-keyed and AQE-planned.
    """
    bg = shingles(F.col("text"), 2)
    n_big = F.size(bg)
    base = documents.select(
        "doc_id",
        "lang",
        F.when(
            n_big > 0,
            F.round(
                (n_big - F.size(F.array_distinct(bg))).cast("double") / n_big.cast("double"),
                6,
            ),
        ).alias("dup_bigram_frac"),
    )
    term_counts = (
        documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    hist = term_counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("cnt") * F.length("term")).alias("tok_chars"),
    )
    n_tok = F.col("n_tokens").cast("double")
    distinct_ratio = F.round(F.col("n_distinct").cast("double") / n_tok, 6)
    top_token_frac = F.round(F.col("max_cnt").cast("double") / n_tok, 6)
    mean_word_len = F.round(F.col("tok_chars").cast("double") / n_tok, 6)
    # LEFT join: a document with no tokens at all has no histogram row
    # but must still surface (as n_tokens=0, quality_ok=false) — a
    # quality FILTER that silently loses rows would corrupt counts
    # downstream.
    out = base.join(hist, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        top_token_frac.alias("top_token_frac"),
        "dup_bigram_frac",
        mean_word_len.alias("mean_word_len"),
    )
    quality_ok = (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
        & (F.col("top_token_frac") <= MAX_TOP_TOKEN_FRAC)
        & (F.coalesce(F.col("dup_bigram_frac"), F.lit(0.0)) <= MAX_DUP_BIGRAM_FRAC)
        & F.col("mean_word_len").between(*MEAN_WORD_LEN_RANGE)
    )
    return out.withColumn("quality_ok", quality_ok)


def quality_signals_ppm(documents: DataFrame) -> DataFrame:
    """Gate-stable twin of :func:`quality_signals`: every ratio is a
    parts-per-million BIGINT computed with pure *integer* division
    (``x div y``), and ``quality_ok`` is derived from those integers —
    no double arithmetic anywhere in the comparison path, so Spark and
    any SQL oracle agree bit-for-bit regardless of each engine's float
    rounding or formatting rules (round 2's one red driver row was
    exactly such a float-canonicalization fragility).

    Same plan shape as the double-valued version: scan → explode →
    two combinable aggregations → doc-keyed equi-join.  Thresholds are
    the ppm images of the module constants (floor-division boundary
    semantics; both engines truncate non-negative quotients the same
    way).
    """
    bg = shingles(F.col("text"), 2)
    base = documents.select(
        "doc_id",
        "lang",
        F.size(bg).cast("long").alias("n_big"),
        F.size(F.array_distinct(bg)).cast("long").alias("n_big_distinct"),
    ).select(
        "doc_id",
        "lang",
        F.expr(
            "CASE WHEN n_big > 0 THEN ((n_big - n_big_distinct) * 1000000) div n_big END"
        ).alias("dup_bigram_ppm"),
    )
    term_counts = (
        documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    hist = term_counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tok"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("cnt") * F.length("term")).alias("tok_chars"),
    )
    out = base.join(hist, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_tok"), F.lit(0)).alias("n_tokens"),
        F.expr("(n_distinct * 1000000) div n_tok").alias("distinct_ppm"),
        F.expr("(max_cnt * 1000000) div n_tok").alias("top_token_ppm"),
        "dup_bigram_ppm",
        F.expr("(tok_chars * 1000000) div n_tok").alias("mean_word_len_micro"),
    )
    quality_ok = (
        (F.col("n_tokens") >= F.lit(MIN_TOKENS))
        & (F.col("distinct_ppm") >= F.lit(int(MIN_DISTINCT_RATIO * 1_000_000)))
        & (F.col("top_token_ppm") <= F.lit(int(MAX_TOP_TOKEN_FRAC * 1_000_000)))
        & (
            F.coalesce(F.col("dup_bigram_ppm"), F.lit(0))
            <= F.lit(int(MAX_DUP_BIGRAM_FRAC * 1_000_000))
        )
        & F.col("mean_word_len_micro").between(
            int(MEAN_WORD_LEN_RANGE[0] * 1_000_000),
            int(MEAN_WORD_LEN_RANGE[1] * 1_000_000),
        )
    )
    return out.withColumn("quality_ok", quality_ok)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Deliberately simple, RE2-compatible patterns (the oracle runs them in
# DuckDB's RE2 engine; Spark runs them in java.util.regex — the subset
# below behaves identically in both).
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\b555-[0-9]{4}\\b"
IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def with_synthetic_pii(documents: DataFrame) -> Column | DataFrame:
    """Deterministically append synthetic PII to the driver's corpus
    (it is word-soup with none) so the redaction path has real work:
    every doc_id≡0 (mod 3) gains an email, ≡1 (mod 4) a phone number,
    ≡2 (mod 5) an IPv4 — some docs get several, most get at least one,
    and a fixed residue class gets none at all."""
    d = F.col("doc_id")
    email = F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com"))
    phone = F.concat(F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0"))
    ip = F.concat(
        F.lit(" host 10."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 7) % 256).cast("string"),
        F.lit("."),
        ((d * 13) % 256).cast("string"),
    )
    text2 = F.concat(
        F.col("text"),
        F.when(d % 3 == 0, email).otherwise(F.lit("")),
        F.when(d % 4 == 1, phone).otherwise(F.lit("")),
        F.when(d % 5 == 2, ip).otherwise(F.lit("")),
    )
    return documents.withColumn("text", text2)


def pii_redact(documents: DataFrame, keep_text: bool = False) -> DataFrame:
    """Count and scrub emails / phones / IPv4s from ``text``.

    Pure per-row expressions (``regexp_count`` + a ``regexp_replace``
    chain, email first so its digits can't shadow the later numeric
    patterns) — no shuffle, no UDF; at 100 TB this is a map-only pass
    that fuses into the scan.  The redacted text is surfaced as an md5
    so the result stays canonicalizable downstream; pass
    ``keep_text=True`` to also get the redacted string (debugging /
    downstream pipelines that consume the scrubbed corpus).
    """
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PHONE_RE))
    n_ips = F.regexp_count(t, F.lit(IP_RE))
    cols = [
        F.col("doc_id"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("has_pii"),
        F.md5(redacted).alias("redacted_md5"),
    ]
    if keep_text:
        cols.append(redacted.alias("redacted"))
    return documents.select(*cols)


def bigram_logprob_score(documents: DataFrame, lam: float = 0.7) -> DataFrame:
    """Per-document mean negative log-probability under a
    Jelinek-Mercer-interpolated bigram language model estimated from
    the corpus itself — the next rung above
    :func:`unigram_logprob_score` on the LM-quality-filter ladder:
    word-ORDER coherence.  Scrambled or boilerplate-stitched text has
    plausible unigrams but improbable transitions, so it scores high
    here and unremarkable there.

        p(w_i | w_{i-1}) = λ · c(w_{i-1}, w_i) / c(w_{i-1})
                         + (1 − λ) · c(w_i) / N

    (Jelinek & Mercer 1980 interpolation; every bigram in scope was
    observed at least once, the unigram term guards the λ→1 edge and
    smooths rare continuations.)

    Scale shape: the bigram table is built map-side from each doc's
    token array (``zip_with`` of the two shifted slices — no
    self-join), then three additive aggregations (bigram counts,
    unigram counts, total N) and equi-joins keyed on the bigram /
    unigram — the same token-sized shuffle family as TF-IDF, all
    combinable.  Docs with fewer than 2 tokens have no transitions
    and are absent from the output (same contract as the unigram
    scorer for tokenless docs).  Rounded 6dp; DuckDB-twinned in
    tests/test_consolidated.py."""
    t = F.filter(tokens(F.col("text")), lambda x: x != "")
    pairs = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = documents.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    uni = documents.select(F.explode(tokens(F.col("text"))).alias("term")).where(
        F.col("term") != ""
    )
    uni_counts = uni.groupBy("term").agg(F.count("*").alias("c1"))
    total = uni.agg(F.count("*").alias("n_total"))
    bi_counts = big.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    p = F.lit(lam) * F.col("cb").cast("double") / F.col("c1").cast("double") + F.lit(
        1.0 - lam
    ) * F.col("c2").cast("double") / F.col("n_total").cast("double")
    return (
        big.join(bi_counts, ["w1", "w2"])
        .join(uni_counts, F.col("w1") == F.col("term"))
        .drop("term")
        .join(
            uni_counts.select(F.col("term").alias("_t2"), F.col("c1").alias("c2")),
            F.col("w2") == F.col("_t2"),
        )
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("mean_neg_logp2"),
        )
    )


def unigram_logprob_score(documents: DataFrame) -> DataFrame:
    """Per-document mean unigram negative log-probability — the
    information-theoretic quality/novelty signal (a document of rare
    tokens scores high, boilerplate scores low; the cheap proxy for a
    language-model perplexity filter).

    Two additive aggregations (corpus unigram counts; per-doc sums
    after an equi-join on term) — the same shuffle shape as TF-IDF;
    the corpus-total row rides along as a broadcast scalar.  Rounded
    6dp over double math identical in DuckDB.
    """
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).where(F.col("term") != "")
    freq = toks.groupBy("term").agg(F.count("*").alias("tf"))
    total = toks.agg(F.count("*").alias("n_total"))
    scored = (
        toks.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("tf").cast("double") / F.col("n_total").cast("double"))),
                6,
            ).alias("mean_neg_logp"),
        )
    )
    return scored
