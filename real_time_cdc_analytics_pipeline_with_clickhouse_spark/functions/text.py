"""Text-analysis column helpers for the LLM-data-pipeline extensions.

All JVM-side expressions (split/regexp/transform/aggregate) — no Python
UDFs — so they vectorize and scale linearly with input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Deterministic marker-word lists for the n-gram/stopword language-ID
# heuristic.  The driver's synthetic documents are English-ish token
# soup with a `lang` facet; these lists are the *mechanism* (count
# marker hits per language, argmax) — swap in real lists for prod.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "de", "los"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]

WORD_RE = "[a-z0-9]+"


def normalize_text(c: Column) -> Column:
    """Lowercase, collapse non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(c), " ")


# The one-tokenize contract: a documents frame may carry the canonical
# token array MATERIALIZED under this column (it MUST equal
# ``tokens(text)`` — the unified ingest sink computes it once per
# micro-batch and persists it); tokenizing consumers (embedder,
# text-index postings, shingles) then derive from the stored array
# instead of re-running the normalize/split over the text.
TOKENS_COL = "_toks"


def doc_token_col(df) -> Column:
    """The token array of a documents frame: the materialized
    ``TOKENS_COL`` when present, else computed from ``text``.
    Semantics are IDENTICAL by the column's contract — callers never
    branch on which source they got."""
    return F.col(TOKENS_COL) if TOKENS_COL in df.columns else tokens(F.col("text"))


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """A BPE-flavored proxy: count word pieces + digit runs + symbols.

    ``regexp_count`` over the raw text — words contribute
    ceil(len/4)-ish pieces via 4-char chunks, matching how byte-pair
    vocabularies split long words.  Deterministic and SQL-portable.
    """
    return F.regexp_count(F.lower(c), F.lit("[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\s]"))


def stopword_ratio(c: Column) -> Column:
    toks = tokens(c)
    stop = F.filter(toks, lambda t: t.isin(STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stop).cast("double") / F.size(toks).cast("double"))


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double"))


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an *already materialized* token array."""
    k = F.size(t) - (n - 1)
    arr = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]),
    )
    # guard: F.sequence(0, -1) would DESCEND, not produce an empty array
    return F.when(k > 0, arr).otherwise(F.array().cast("array<string>"))


def shingles(c: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>) of the normalized text.

    The token array is bound as a higher-order-function *input*
    (``transform(array(tokens), t -> ...)``) so it is evaluated once
    per row.  Referencing the tokens expression inside the lambda
    instead would re-run normalize+split per element_at — measured
    ~50× slower on real documents.
    """
    bound = F.transform(F.array(tokens(c)), lambda t: shingles_from_tokens(t, n))
    return F.element_at(bound, 1)
