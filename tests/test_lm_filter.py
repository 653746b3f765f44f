"""N-gram LM perplexity filtering (CCNet-style, Wenzek et al. 2020):
the stored bigram model's scores must match an independent pure-Python
oracle exactly (same tokenizer, same add-α smoothing, float64 math);
the gate must separate in-domain text from gibberish; tokenless docs
survive with NULL evidence; the one-tokenize contract holds."""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
    TOKENS_COL,
    tokens,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
    lm_filter,
)
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table

from tests.test_document_ingest import _no_tokenize_above_cache
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.plans.explain import (
    plan_string,
)


def _tok(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if t]


def _py_oracle(ref_texts, score_docs, alpha):
    """Independent bigram-LM implementation: dict counts, float64
    math, the module's exact formula."""
    bi, seen_w2 = {}, set()
    for t in ref_texts:
        seq = [lm_filter.BOS] + _tok(t)
        for a, b in zip(seq, seq[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            seen_w2.add(b)
    ctx = {}
    for (a, _b), c in bi.items():
        ctx[a] = ctx.get(a, 0) + c
    V = len(seen_w2) + 1
    out = {}
    for doc_id, t in score_docs:
        seq = [lm_filter.BOS] + _tok(t)
        lps = [
            math.log((bi.get((a, b), 0) + alpha) / (ctx.get(a, 0) + alpha * V))
            for a, b in zip(seq, seq[1:])
        ]
        out[doc_id] = (len(lps), math.exp(-sum(lps) / len(lps)) if lps else None)
    return out


def test_scores_match_python_oracle(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.where(F.col("doc_id") < 150)
    to_score_rows = [(r.doc_id, r.text) for r in docs.where(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 200)
    ).collect()] + [(990_000, ""), (990_001, "!!! ???")]  # tokenless
    to_score = spark.createDataFrame(to_score_rows, "doc_id long, text string")

    lm = str(tmp_path / "lm")
    lm_filter.train_ngram_lm(ref, lm, alpha=0.1)
    meta = lm_filter.read_lm_manifest(lm)
    assert meta["alpha"] == 0.1 and meta["vocab_size"] > 1

    got = {
        r.doc_id: (r.n_bigrams, r.ppl)
        for r in lm_filter.perplexity_score(spark, to_score, lm).collect()
    }
    ref_texts = [r.text for r in ref.collect()]
    want = _py_oracle(ref_texts, to_score_rows, alpha=0.1)
    assert set(got) == set(want)
    for d, (n, ppl) in want.items():
        assert got[d][0] == n, d
        if ppl is None:
            assert got[d][1] is None, d
        else:
            assert abs(got[d][1] - ppl) <= 1e-9 * ppl, (d, got[d][1], ppl)


def _structured_corpus(n_docs: int, seed: int, doc_base: int):
    """Deterministic reference with REAL bigram structure (the fixture
    documents are token soup over a 31-word pool — near-uniform
    bigrams, nothing for an LM to learn): each doc is a sample of
    fixed subject-verb-object templates, so transitions like
    "the engine" / "engine reads" recur heavily."""
    import random

    rng = random.Random(seed)
    subj = ["the engine", "the planner", "a worker", "the scheduler"]
    verb = ["reads", "writes", "joins", "sorts", "merges"]
    obj = ["the table", "a stream", "the index", "a batch", "the corpus"]
    docs = []
    for i in range(n_docs):
        sents = [
            f"{rng.choice(subj)} {rng.choice(verb)} {rng.choice(obj)}"
            for _ in range(12)
        ]
        docs.append((doc_base + i, ". ".join(sents)))
    return docs


def test_filter_separates_unstructured_text_and_routes_tokenless(spark, tmp_path):
    ref_rows = _structured_corpus(120, seed=3, doc_base=0)
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    lm = str(tmp_path / "lm")
    lm_filter.train_ngram_lm(ref, lm)

    indomain = _structured_corpus(20, seed=99, doc_base=1000)  # held out
    # the sharp case: SAME vocabulary, shuffled order — unigram stats
    # identical, bigram structure destroyed (what a frequency-based
    # quality gate cannot see and an LM gate exists to catch)
    import random

    rng = random.Random(7)
    shuffled = []
    for i, (_, t) in enumerate(indomain[:10]):
        toks = _tok(t)
        rng.shuffle(toks)
        shuffled.append((2000 + i, " ".join(toks)))
    # and unseen-vocabulary gibberish
    gib = [(3000 + i, " ".join(f"zzq{i}x{j}gib" for j in range(40)))
           for i in range(5)]
    probe = spark.createDataFrame(
        indomain + shuffled + gib + [(990_000, "")], "doc_id long, text string"
    )
    scores = {
        r.doc_id: r.ppl
        for r in lm_filter.perplexity_score(spark, probe, lm).collect()
    }
    worst_in = max(scores[d] for d, _ in indomain)
    best_bad = min(
        [scores[d] for d, _ in shuffled] + [scores[d] for d, _ in gib]
    )
    assert best_bad > worst_in, (worst_in, best_bad)

    cut = (worst_in + best_bad) / 2
    kept = {
        r.doc_id
        for r in lm_filter.perplexity_filter(spark, probe, lm, max_ppl=cut).collect()
    }
    assert kept == {d for d, _ in indomain}
    kept2 = {
        r.doc_id
        for r in lm_filter.perplexity_filter(
            spark, probe, lm, max_ppl=cut, keep_tokenless=True
        ).collect()
    }
    assert kept2 == kept | {990_000}


def test_one_tokenize_contract(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(60).select("doc_id", "text")
    lm = str(tmp_path / "lm")
    lm_filter.train_ngram_lm(docs, lm)
    frame = docs.withColumn(TOKENS_COL, tokens(F.col("text"))).persist()
    try:
        frame.count()
        scored = lm_filter.perplexity_score(spark, frame, lm)
        plan = plan_string(lm_filter._doc_bigrams(frame), mode="simple")
        assert "InMemoryTableScan" in plan
        assert _no_tokenize_above_cache(plan), plan
        base = {
            (r.doc_id, r.n_bigrams, round(r.ppl, 9))
            for r in lm_filter.perplexity_score(spark, docs, lm).collect()
        }
        cached = {
            (r.doc_id, r.n_bigrams, round(r.ppl, 9)) for r in scored.collect()
        }
        assert cached == base
    finally:
        frame.unpersist()


def test_update_equals_retrain_and_replays_no_op(spark, tmp_path):
    """Bigram counts are additive: the incrementally-updated model
    must equal a from-scratch retrain on the unioned corpora in exact
    integer counts (and therefore in every score); a replayed epoch is
    a no-op; superseded versions retire."""
    import os

    a = spark.createDataFrame(_structured_corpus(60, seed=1, doc_base=0),
                              "doc_id long, text string")
    b = spark.createDataFrame(_structured_corpus(40, seed=2, doc_base=5000),
                              "doc_id long, text string")
    inc = str(tmp_path / "inc")
    lm_filter.train_ngram_lm(a, inc, alpha=0.2)
    lm_filter.update_ngram_lm(spark, inc, b, epoch=0)
    full = str(tmp_path / "full")
    lm_filter.train_ngram_lm(a.unionByName(b), full, alpha=0.2)

    mi, mf = lm_filter.read_lm_manifest(inc), lm_filter.read_lm_manifest(full)
    assert (mi["vocab_size"], mi["n_bigrams"]) == (mf["vocab_size"], mf["n_bigrams"])
    bi_i, _ = lm_filter._lm_paths(inc, mi)
    bi_f, _ = lm_filter._lm_paths(full, mf)
    rows_i = {(r.w1, r.w2): r.c for r in spark.read.parquet(bi_i).collect()}
    rows_f = {(r.w1, r.w2): r.c for r in spark.read.parquet(bi_f).collect()}
    assert rows_i == rows_f  # exact integer identity

    probe = spark.createDataFrame(
        _structured_corpus(10, seed=9, doc_base=9000), "doc_id long, text string"
    )
    gi = {(r.doc_id, r.n_bigrams, round(r.ppl, 9))
          for r in lm_filter.perplexity_score(spark, probe, inc).collect()}
    gf = {(r.doc_id, r.n_bigrams, round(r.ppl, 9))
          for r in lm_filter.perplexity_score(spark, probe, full).collect()}
    assert gi == gf

    # replayed epoch: no-op (version and counts unchanged)
    lm_filter.update_ngram_lm(spark, inc, b, epoch=0)
    assert lm_filter.read_lm_manifest(inc)["version"] == 1
    # next update retires v0's bare tables, keeps v1 for in-flight readers
    lm_filter.update_ngram_lm(spark, inc, probe, epoch=1)
    assert lm_filter.read_lm_manifest(inc)["version"] == 2
    assert not os.path.isdir(f"{inc}/bigrams")
    assert os.path.isdir(f"{inc}/bigrams_v1") and os.path.isdir(f"{inc}/bigrams_v2")


def test_unified_sink_lm_gate_drops_unstructured_docs(spark, tmp_path):
    """The perplexity gate inside start_document_ingest_sink: docs the
    reference LM predicts badly (same vocabulary, shuffled order —
    invisible to every other gate) never enter the corpus or any
    serving artifact; tokenless docs pass through to the other
    gates."""
    import os
    import random

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        retrieval,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.streaming import (
        pipeline as sp,
    )

    ref = spark.createDataFrame(_structured_corpus(120, seed=3, doc_base=0),
                                "doc_id long, text string")
    lm = str(tmp_path / "lm")
    lm_filter.train_ngram_lm(ref, lm)

    good = _structured_corpus(15, seed=77, doc_base=10_000)
    rng = random.Random(5)
    bad = []
    for i, (_, t) in enumerate(good[:6]):
        toks = _tok(t)
        rng.shuffle(toks)
        bad.append((20_000 + i, " ".join(toks)))
    rows = [(d, t, "en", "s") for d, t in good + bad]
    batch = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")

    # pick the cut from the scores themselves (threshold policy is the
    # deployment's; the gate mechanics are what's under test)
    sc = {
        r.doc_id: r.ppl
        for r in lm_filter.perplexity_score(
            spark, batch.select("doc_id", "text"), lm
        ).collect()
    }
    cut = (max(sc[d] for d, _ in good) + min(sc[d] for d, _ in bad)) / 2

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    batch.coalesce(1).write.mode("overwrite").parquet(f"{feed}/f0.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed + "/*.parquet")
    )
    corpus, mh, tix, ivf = (str(tmp_path / d) for d in ("c", "m", "t", "i"))
    q = sp.start_document_ingest_sink(
        stream, corpus, mh, tix, ivf, str(tmp_path / "ck"),
        compact_every=None, n_centroids=4, seed=7, lm_dir=lm, max_ppl=cut,
    )
    q.processAllAvailable()
    q.stop()

    got = {r.doc_id for r in spark.read.parquet(corpus).select("doc_id").collect()}
    assert got == {d for d, _ in good}
    # the shuffled docs never reached the text index either
    for d, t in bad:
        terms = _tok(t)[:3]
        hits = {
            r.doc_id
            for r in retrieval.bm25_topk_from_index(spark, tix, terms, k=30).collect()
        }
        assert d not in hits
