"""Lexical retrieval over the document corpus (north-star extension).

``bm25_topk`` ranks documents against a bag-of-terms query with the
BM25 weighting (Robertson/Spärck Jones probabilistic relevance — the
default lexical ranker in Lucene/Elasticsearch), complementing the
embedding-side ANN operators: hybrid pipelines retrieve lexically AND
semantically, then fuse (``rrf_fuse``).

Scale shape at 100 TB:

- the query-term filter lands BEFORE any aggregation, so the only
  per-corpus work is the tokenize+filter scan — the shuffled
  term-frequency table holds just (candidate doc × query term) rows;
- per-term document frequencies are |query| rows → broadcast join;
- corpus stats (N, avgdl) are a one-row aggregate → broadcast
  cross join (a length scan the warehouse would keep as a stored
  per-doc column anyway — pass ``doc_lengths`` to skip the recount);
- the final ranking sorts only candidate docs (bounded by term
  selectivity), never the corpus.

Everything is native Catalyst expressions (explode, groupBy, ln) —
no Python in the row path — and scores round to 4 dp before ranking
so the DuckDB oracle (tests/test_consolidated.py) is bit-stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def doc_lengths(documents: DataFrame) -> DataFrame:
    """(doc_id, dl) token lengths — store this next to the corpus at
    scale; every retrieval call needs it."""
    return documents.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("dl")
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)   = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)

    Terms are matched against the same normalized token stream every
    text operator uses (lowercase, alnum runs), so feed lowercase
    query terms.  Deterministic total order: (rounded score DESC,
    doc_id) — the k-boundary never depends on engine sort stability.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = [t.lower() for t in query_terms]
    dlen = lengths if lengths is not None else doc_lengths(documents)
    stats = dlen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        documents.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .where(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    part = F.col("tf") * (k1 + 1.0) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dft), "term")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * part), 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic result list
    (Cormack et al. SIGIR'09): fused(d) = Σ_lists 1/(c + rank_d) —
    the standard score-free hybrid-retrieval combiner (scores from
    BM25 and cosine are not commensurable; ranks are).

    Inputs: ``lexical`` with (doc_id, bm25), ``semantic`` with
    (doc_id, cos_sim) — both already top-n lists, so everything here
    is list-sized; ranks come from one window per list with the same
    deterministic tie-break the producers use."""
    lw = Window.orderBy(F.col("bm25").desc(), "doc_id")
    sw = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    lr = lexical.select("doc_id", F.row_number().over(lw).alias("r"))
    sr = semantic.select("doc_id", F.row_number().over(sw).alias("r"))
    both = lr.unionByName(sr)
    return (
        both.groupBy("doc_id")
        .agg(F.round(F.sum(1.0 / (c + F.col("r"))), 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(k)
    )
