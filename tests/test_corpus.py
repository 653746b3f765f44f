"""Behavioral tests for the corpus-curation operators (r2): duplicate
clustering, deterministic sampling, sequence packing.

Oracle parity for all three runs through the driver gate
(tools/check_oracle.py / CORRECTNESS_r{N}.json); these tests pin the
*semantics* on constructed inputs where the expected answer is known
by hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import tokens
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus, dedup
from real_time_cdc_analytics_pipeline_with_clickhouse_spark.tables import load_table


# ---------------------------------------------------------------------------
# connected components / dedup_clusters
# ---------------------------------------------------------------------------


def test_connected_components_merges_chains(spark):
    """A chain a-b, b-c plus a separate pair must give exactly two
    components labeled by their minimum node."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["label"] for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    """A 12-node path graph needs multiple propagation rounds — the
    convergence loop must run them all, not stop after one."""
    edges = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels = {r["label"] for r in dedup.connected_components(pairs).collect()}
    assert labels == {0}


def test_connected_components_fused_first_round(spark):
    """The round-11 fused init (labels start at min over each node's
    closed neighborhood — one groupBy, no join) must agree with the
    star variant on a graph mixing every shape the init touches: a
    self-pair, a clique, a multi-round path, and reversed edge
    direction (doc_b < doc_a)."""
    edges = (
        [(5, 5)]                                   # isolated self-pair
        + [(20, 21), (21, 22), (20, 22)]           # clique
        + [(i, i + 1) for i in range(30, 36)]      # path (needs rounds)
        + [(42, 41)]                               # reversed pair
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    prop = {r["doc_id"]: r["label"] for r in dedup.connected_components(pairs).collect()}
    star = {
        r["doc_id"]: r["label"]
        for r in dedup.connected_components_star(pairs).collect()
    }
    want = {5: 5, 20: 20, 21: 20, 22: 20, 41: 41, 42: 41}
    want.update({i: 30 for i in range(30, 37)})
    assert prop == want
    assert star == want


def test_dedup_clusters_cover_constructed_duplicates(spark, sf_dir):
    """Every constructed duplicate (doc_id + 100000) must land in the
    same cluster as its source, and cluster_id = min member."""
    docs = dedup.with_exact_duplicates(load_table(spark, sf_dir, "documents"))
    rows = dedup.dedup_clusters(docs).collect()
    cl = {r["doc_id"]: r["cluster_id"] for r in rows}
    originals = [d for d in cl if d < 100000 and d % 10 == 0]
    assert originals, "no constructed duplicates clustered"
    for d in originals:
        assert cl.get(d + 100000) == cl[d] == min(cl[d], d)
    for r in rows:
        assert r["cluster_size"] >= 2 or cl[r["cluster_id"]] is not None


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


def test_sample_is_deterministic_and_stratified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r["doc_id"] for r in corpus.deterministic_sample(docs).collect())
    b = sorted(r["doc_id"] for r in corpus.deterministic_sample(docs).collect())
    assert a == b and a, "sampling must be reproducible run-to-run"
    by_lang = {
        r["lang"]: r["cnt"]
        for r in corpus.deterministic_sample(docs)
        .groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    tot = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    # strata with rate 1.0 keep everything except the short-doc gate
    for lang in tot:
        if lang not in corpus.SAMPLE_RATES:
            assert by_lang.get(lang, 0) <= tot[lang]
    # down-weighted strata keep roughly the target share (hash-uniform)
    assert 0.3 <= by_lang["en"] / tot["en"] <= 0.7
    assert by_lang["zh"] / tot["zh"] <= 0.5


def test_sample_follows_content_not_row_id(spark):
    """Byte-identical texts under different doc_ids get the same verdict."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en"),
         (2, "alpha beta gamma delta epsilon zeta", "en"),
         (3, "one two three four five six", "en")],
        "doc_id long, text string, lang string",
    )
    kept = {r["doc_id"] for r in corpus.deterministic_sample(docs).collect()}
    assert (1 in kept) == (2 in kept)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_greedy_fill(spark):
    """Known token counts in one shard → hand-checkable packing."""
    texts = {
        0: "a " * 300,   # 300 tokens (trailing trim) -> pack 0 @ 0
        32: "b " * 200,  # fits: pack 0 @ 300 (300+200=500 <= 512)
        64: "c " * 20,   # overflow (520 > 512): pack 1 @ 0
        96: "d " * 600,  # longer than capacity: own pack 2 @ 0
        128: "e " * 10,  # pack 3 @ 0 (600+10 > 512)
    }
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in corpus.pack_sequences(docs).collect()}
    assert all(r["shard"] == 0 for r in rows.values())
    assert (rows[0]["pack_id"], rows[0]["off_tokens"]) == (0, 0)
    assert (rows[32]["pack_id"], rows[32]["off_tokens"]) == (0, 300)
    assert (rows[64]["pack_id"], rows[64]["off_tokens"]) == (1, 0)
    assert (rows[96]["pack_id"], rows[96]["off_tokens"]) == (2, 0)
    assert (rows[128]["pack_id"], rows[128]["off_tokens"]) == (3, 0)


def test_pack_sequences_invariants_on_corpus(spark, sf_dir):
    """Corpus-wide invariants: every doc placed exactly once; no pack
    overflows unless it holds a single oversized doc; pack ids are
    dense per shard."""
    docs = load_table(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(docs)
    assert packed.count() == docs.count()
    over = packed.where(
        (F.col("off_tokens") + F.col("n_tokens") > corpus.PACK_CAPACITY)
        & (F.col("off_tokens") > 0)
    )
    assert over.count() == 0
    dense = (
        packed.groupBy("shard")
        .agg(F.countDistinct("pack_id").alias("n"), F.max("pack_id").alias("mx"))
        .where(F.col("n") != F.col("mx") + 1)
    )
    assert dense.count() == 0


def test_prepare_training_corpus_invariants(spark, sf_dir):
    """Composed quality→redact→dedup→split flow: survivors are a
    subset of quality passes, contain no verified near-dup pair, carry
    a valid split, and the whole flow is deterministic."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        corpus,
        dedup,
        quality,
    )

    docs = dedup.with_exact_duplicates(load_table(spark, sf_dir, "documents"))
    out = corpus.prepare_training_corpus(docs)
    rows = out.collect()
    assert rows, "pipeline should keep something"
    ids = {r["doc_id"] for r in rows}

    ok_ids = {
        r["doc_id"]
        for r in quality.quality_signals(docs).where("quality_ok").collect()
    }
    assert ids <= ok_ids, "a quality-rejected doc survived"

    # no surviving exact-duplicate pair (exact dups are Jaccard 1.0):
    # of each constructed (doc_id, doc_id+100000) pair that passed the
    # quality gate, at most one side may remain
    paired = {i for i in ids if i >= 100000 and (i - 100000) in ids}
    assert not paired, f"near-dup pairs survived dedup: {sorted(paired)[:5]}"

    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    again = {(r["doc_id"], r["split"], r["redacted_md5"]) for r in corpus.prepare_training_corpus(docs).collect()}
    assert again == {(r["doc_id"], r["split"], r["redacted_md5"]) for r in rows}


def test_heavy_hitters_superset_of_true(spark, sf_dir):
    """freqItems guarantee: every term whose occurrence share exceeds
    the support threshold must appear in the candidate set."""
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import tokens
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    got = {r["term"] for r in corpus.heavy_hitter_terms(docs, support=0.02).collect()}
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term")).where(F.col("term") != "")
    n = toks.count()
    true_heavy = {
        r["term"]
        for r in toks.groupBy("term").count().where(F.col("count") > 0.02 * n).collect()
    }
    assert true_heavy, "fixture corpus should have heavy terms at 2%"
    missing = true_heavy - got
    assert not missing, f"freqItems dropped true heavy hitters: {sorted(missing)[:5]}"


def test_content_defined_chunks_reassemble_and_stability(spark, sf_dir):
    """Chunks must concatenate back to the normalized text, and a
    prefix edit must leave the boundary structure after the edit
    region intact (the content-defined property — fixed-size chunking
    would shift every later chunk)."""
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
        normalize_text,
    )
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents").limit(80)
    chunks = corpus.content_defined_chunks(docs)
    rejoined = chunks.orderBy("doc_id", "chunk_idx").groupBy("doc_id").agg(
        F.concat_ws("", F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))).getField("chunk")).alias("glued")
    )
    orig = docs.select("doc_id", normalize_text(F.col("text")).alias("norm"))
    bad = rejoined.join(orig, "doc_id").where(F.col("glued") != F.col("norm")).count()
    assert bad == 0

    edited = docs.select("doc_id", F.concat(F.lit("zzedit marker "), F.col("text")).alias("text"))
    a = {(r["doc_id"], r["chunk"]) for r in chunks.collect()}
    b = {(r["doc_id"], r["chunk"]) for r in corpus.content_defined_chunks(edited).collect()}
    # shared chunks despite the prefix edit: boundaries resynchronize
    overlap = len(a & b) / max(1, len(a))
    assert overlap > 0.5, f"content-defined boundaries did not resync: {overlap:.2f}"


def test_content_defined_chunks_segmented_path_matches_and_bounds_memory(spark):
    """Round-2 verdict #6: (a) the segmented long-doc path must produce
    byte-identical chunks to the single-expression path (overlap of
    window-1 chars makes boundary decisions segment-local); (b) a >1 MB
    document flows through it with the transient hash arrays bounded at
    O(segment) — this very test OOM'd the executor with the old
    O(document) sequence at default driver memory; (c) short docs below
    the hash window and empty docs behave explicitly."""
    import pyspark.sql.functions as F

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import corpus

    # deterministic pseudo-random ~40-char-word text, no Date/rand needed
    docs = spark.range(4).selectExpr(
        "id AS doc_id",
        """concat_ws(' ', transform(sequence(1, 2000 + cast(id AS int) * 500),
             j -> substr(md5(concat(id, ':', j)), 1, 1 + pmod(j, 12)))) AS text""",
    )
    base = {
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in corpus.content_defined_chunks(docs).collect()
    }
    segmented = {
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in corpus.content_defined_chunks(docs, segment=512).collect()
    }
    assert base == segmented

    # (b) one ~1.2 MB document through the segmented path: reassembles
    big = spark.sql(
        """SELECT 99 AS doc_id,
                  concat_ws(' ', transform(sequence(1, 200000),
                    j -> substr(md5(concat('big:', j)), 1, 1 + pmod(j, 8)))) AS text"""
    )
    assert big.selectExpr("length(text) AS n").collect()[0]["n"] > 1_000_000
    out = corpus.content_defined_chunks(big)
    glued = (
        out.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))).getField("chunk")
            ).alias("glued"),
            F.count("*").alias("n_chunks"),
        )
        .collect()[0]
    )
    norm = big.selectExpr("trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS t").collect()[0]["t"]
    assert glued["glued"] == norm and glued["n_chunks"] > 1000

    # (c) sub-window and empty docs: whole doc as one chunk / no rows
    tiny = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "   "), (4, "exactly8")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["chunk_idx"], r["chunk"]) for r in corpus.content_defined_chunks(tiny).collect()}
    assert got[1] == (0, "abc") and got[4][1] == "exactly8"
    assert 2 not in got and 3 not in got  # empty-normalized docs yield no rows


def test_star_cc_equals_propagation_and_handles_long_paths(spark, sf_dir):
    """Large-star/small-star CC must (a) produce the identical labeling
    as min-label propagation on the real LSH dup graph, (b) converge in
    O(log n) rounds on a 300-node path — where propagation needs
    diameter rounds and now raises instead of silently returning a
    half-propagated (wrong) labeling."""
    import pytest as _pytest

    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import dedup

    docs = dedup.with_exact_duplicates(load_table(spark, sf_dir, "documents").limit(400))
    pairs = dedup.minhash_lsh_pairs(docs).localCheckpoint()
    a = sorted(map(tuple, dedup.connected_components(pairs).collect()))
    b = sorted(map(tuple, dedup.connected_components_star(pairs).collect()))
    assert a == b

    path = spark.range(299).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    labels = {r["doc_id"]: r["label"] for r in dedup.connected_components_star(path).collect()}
    assert len(labels) == 300 and set(labels.values()) == {0}

    # deep graph + fallback disabled → loud failure, never a silent
    # half-propagated labeling
    with _pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(path, max_iter=10, fallback_to_star=False)

    # default: the same deep graph auto-switches to the star variant
    # and still produces the correct labeling
    auto = {r["doc_id"]: r["label"] for r in dedup.connected_components(path, max_iter=10).collect()}
    assert len(auto) == 300 and set(auto.values()) == {0}


def test_content_defined_chunks_multibyte_unicode(spark):
    """The char-array chunking path must treat multibyte characters
    (CJK, emoji, combining marks) as single units: chunks reassemble
    to the normalized text and both paths agree — the failure mode
    being guarded is byte-offset arithmetic leaking into what must be
    CHARACTER indexing."""
    texts = [
        "数据 处理 引擎 在 大规模 语料 上 运行 " * 40,
        "mixté unicode ñ données 🙂 emoji 🚀 test höher straße " * 30,
        "ascii and 中文 mixed zusammen με ελληνικά and עברית " * 35,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = corpus.content_defined_chunks(docs)
    glued = {
        r["doc_id"]: r["glued"]
        for r in out.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))).getField("chunk")
            ).alias("glued")
        )
        .collect()
    }
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
        normalize_text,
    )

    norm = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", normalize_text(F.col("text")).alias("n")).collect()
        if r["n"]  # normalize_text is [a-z0-9]-alphabet: a pure-CJK doc
        # normalizes to '' and correctly yields no chunk rows
    }
    assert glued == norm
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, corpus.content_defined_chunks(docs, segment=256).collect()))
    assert a == b


def test_repeated_passages_found_at_any_offset(spark, sf_dir):
    """A ~600-char passage planted into four documents at DIFFERENT
    offsets (different surrounding text) must surface as shared chunk
    digests covering exactly those four docs; untouched controls must
    not carry the passage digests."""
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(6).collect()
    passage = (
        " the quarterly compliance addendum must accompany every filing"
        " and remains the property of the issuing office;"
        " redistribution without the customary attribution notice is"
        " not permitted under the standing terms." * 3
    )
    planted_ids = []
    rows = []
    for i, r in enumerate(docs):
        base = (r["text"] or "")[:400]
        if i < 4:
            # different offsets: varying amounts of native text on each side
            txt = base[: 50 * i] + passage + base[50 * i :]
            planted_ids.append(r["doc_id"])
        else:
            txt = base
        rows.append((r["doc_id"], txt, r["lang"], r["source"], len(txt)))
    corpus_df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = corpus.repeated_passages(corpus_df, min_docs=3).collect()
    assert got, "no repeated passages detected"
    by_digest: dict[str, set] = {}
    for r in got:
        by_digest.setdefault(r["passage_md5"], set()).add(r["doc_id"])
    full_cover = [d for d, s in by_digest.items() if s == set(planted_ids)]
    assert full_cover, f"no digest covers exactly the planted docs: {by_digest}"
    # controls never carry a flagged digest
    control_ids = {r[0] for r in rows[4:]}
    assert all(not (s & control_ids) for s in by_digest.values())


def test_repeated_passages_scale_shape(spark, sf_dir):
    """Plan shape: support counting + join back on the digest key only —
    no cartesian products."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    plan = corpus.repeated_passages(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_remove_repeated_passages_keeps_one_occurrence(spark, sf_dir):
    """After excision the planted passage's interior chunks survive in
    at most one document, non-planted text is preserved in order, and
    untouched documents round-trip (normalized) byte-for-byte."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
        normalize_text,
    )

    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(6).collect()
    passage = (
        " the quarterly compliance addendum must accompany every filing"
        " and remains the property of the issuing office;"
        " redistribution without the customary attribution notice is"
        " not permitted under the standing terms." * 3
    )
    rows = []
    planted_ids = []
    for i, r in enumerate(docs):
        base = (r["text"] or "")[:400]
        if i < 4:
            rows.append((r["doc_id"], base[: 50 * i] + passage + base[50 * i :], r["lang"], r["source"], 0))
            planted_ids.append(r["doc_id"])
        else:
            rows.append((r["doc_id"], base, r["lang"], r["source"], 0))
    corpus_df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r["text"] for r in corpus.remove_repeated_passages(corpus_df, min_docs=3).collect()}
    # a mid-passage probe phrase (interior chunks) survives in at most
    # one rewritten doc
    probe = "redistribution without the customary attribution notice"
    carriers = [d for d in planted_ids if probe in out[d]]
    assert len(carriers) <= 1, carriers
    # untouched docs round-trip to their normalized text
    norm = {
        r["doc_id"]: r["n"]
        for r in corpus_df.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    for doc_id, _, _, _, _ in rows[4:]:
        assert out[doc_id] == norm[doc_id]
    # rewritten docs keep their native prose (a prefix of the base text)
    for i, (doc_id, _, _, _, _) in enumerate(rows[:4]):
        native = norm[doc_id].replace(
            spark.createDataFrame([(passage,)], "p string")
            .select(normalize_text(F.col("p")).alias("n"))
            .first()["n"],
            "",
        )
        # every rewritten doc retains at least the leading native chars
        lead = native[:30]
        if lead:
            assert lead in out[doc_id], (doc_id, lead[:30], out[doc_id][:80])


def test_mix_corpus_matches_python_model_and_hits_targets(spark, sf_dir, ducks):
    """Data-mixture recipe: DuckDB+Python model oracle reproduces the
    Spark output exactly; upsampled sources repeat, downsampled ones
    thin, achieved token mass ≈ target (1/denom quantization)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.corpus import mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    recipe = {"src0": 3000, "src1": 700}  # ~2x up, ~0.5x down
    got = sorted(
        map(tuple, mix_corpus(docs, recipe).select("doc_id", "source", "n_tokens", "rep").collect())
    )

    base = ducks.execute(
        """
        SELECT doc_id, source,
               CAST(len(string_split(norm,' ')) AS INT) AS n_tokens,
               CAST(('0x' || substr(md5('mix:' || norm), 1, 15)) AS BIGINT) % 10000 AS u
        FROM (SELECT doc_id, source,
                     trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')) AS norm
              FROM documents)
        WHERE len(string_split(norm,' ')) >= 5 AND source IN ('src0','src1')
        """
    ).fetchall()
    totals = {}
    for _d, s, n, _u in base:
        totals[s] = totals.get(s, 0) + n
    want = []
    for d, s, n, u in base:
        rate = recipe[s] / totals[s]
        copies = int(rate) + (1 if u < round((rate - int(rate)) * 10000) else 0)
        want.extend((d, s, n, rep) for rep in range(1, copies + 1))
    assert got == sorted(want) and len(got) > 0

    achieved = {}
    for _d, s, n, _rep in got:
        achieved[s] = achieved.get(s, 0) + n
    assert achieved["src0"] > totals["src0"]  # upsampling happened
    assert achieved["src1"] < totals["src1"]  # downsampling happened
    for s, target in recipe.items():
        assert abs(achieved[s] - target) / target < 0.35  # small-corpus variance
    assert any(rep == 2 for _d, s, _n, rep in got if s == "src0")


def test_vocab_and_encode_match_duckdb(spark, sf_dir, ducks, tmp_path):
    """Vocabulary + token-id encoding: both the ranked vocab (ids by
    count DESC, term) and every document's id sequence must equal an
    independent DuckDB recomputation; OOV terms encode as 0 (checked
    with a truncated vocab), and an empty-normalizing doc surfaces
    with an empty array."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    extra = spark.createDataFrame([(10**9, "!!!")], "doc_id long, text string")
    docs = docs.union(extra)
    max_size = 20  # below the fixture's distinct-term count -> real OOV
    dpath = str(tmp_path / "vocab_docs")
    docs.write.mode("overwrite").parquet(dpath)

    ctes = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     x -> x <> '') AS toks
  FROM '{dpath}/*.parquet'
),
cnt AS (
  SELECT t AS term, count(*) AS n FROM (SELECT unnest(toks) AS t FROM d) GROUP BY 1
),
v AS (
  SELECT row_number() OVER (ORDER BY n DESC, term) AS token_id, term, n
  FROM cnt ORDER BY n DESC, term LIMIT {max_size}
)
"""
    vocab = corpus.build_vocab(docs, max_size=max_size).persist()
    got_vocab = sorted(map(tuple, vocab.collect()))
    want_vocab = sorted(ducks.execute(ctes + "SELECT * FROM v").fetchall())
    assert got_vocab == want_vocab and len(got_vocab) == max_size

    enc = corpus.encode_tokens(docs, vocab)
    got = {r.doc_id: (list(r.token_ids), r.n_tokens) for r in enc.collect()}
    want = dict(
        (r[0], (r[1] or [], r[2]))
        for r in ducks.execute(ctes + """
, pt AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS term FROM d
),
j AS (
  SELECT pt.doc_id, pt.pos, coalesce(v.token_id, 0) AS tid
  FROM pt LEFT JOIN v USING (term)
),
e AS (SELECT doc_id, list(tid ORDER BY pos) AS ids FROM j GROUP BY doc_id)
SELECT d.doc_id, e.ids, len(toks) AS n
FROM d LEFT JOIN e USING (doc_id)
""").fetchall()
    )
    assert set(got) == set(want)
    for did in got:
        assert got[did] == want[did], (did, got[did], want[did])
    # OOV really happened under the truncated vocab
    assert any(0 in ids for ids, _n in got.values())
    assert got[10**9] == ([], 0)
    vocab.unpersist()


def test_corpus_diff_twin_and_identity(spark, sf_dir, ducks):
    """Snapshot diff: (a) a byte-identical re-ingest diffs to nothing
    even under a different partition layout; (b) a mutated snapshot
    (drops, edits, additions) diffs exactly as DuckDB computes it from
    the same two frames."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert corpus.corpus_diff(docs, docs.repartition(7)).count() == 0

    new = (
        docs.where(F.col("doc_id") % 10 != 3)  # drop residue-3 docs
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 4, F.concat(F.col("text"), F.lit(" EDITED"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.orderBy("doc_id")
            .limit(5)
            .select((F.col("doc_id") + 10**9).alias("doc_id"), "text")
        )
    )
    got = sorted((r.doc_id, r.change) for r in corpus.corpus_diff(docs, new).collect())
    want = sorted(
        ducks.execute(
            """
WITH o AS (SELECT doc_id, md5(text) AS d FROM documents),
n AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 10 = 4 THEN text || ' EDITED' ELSE text END) AS d
  FROM documents WHERE doc_id % 10 <> 3
  UNION ALL
  SELECT doc_id + 1000000000, md5(text)
  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 5)
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.d IS NULL THEN 'added'
            WHEN n.d IS NULL THEN 'removed'
            WHEN o.d <> n.d THEN 'changed' END AS change
FROM o FULL OUTER JOIN n USING (doc_id)
WHERE (o.d IS NULL OR n.d IS NULL OR o.d <> n.d)
"""
        ).fetchall()
    )
    assert got == want and got


def test_corpus_diff_null_text_semantics(spark):
    """NULL text is content, not absence: NULL-in-both diffs to
    nothing, NULL↔text edits report as changed (not added/removed)."""
    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, "y")], "doc_id long, text string"
    )
    got = sorted((r.doc_id, r.change) for r in corpus.corpus_diff(old, new).collect())
    assert got == [(2, "changed"), (3, "changed")]
    assert corpus.corpus_diff(old, old).count() == 0


def test_end_to_end_training_data_pipeline(spark, sf_dir, tmp_path):
    """Capstone composition: curate → split → temperature-mix →
    shuffle-shard → materialize, chained end-to-end the way a
    pretraining data pipeline runs them.  Invariants checked at the
    seams (each stage is already oracle/model-tested alone): no
    val/test leakage into the mixed training set, repeats survive as
    independent rows, the shard union is exactly the mixture, every
    source lands near its temperature target, shards read back in
    order."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.functions.text import (
        tokens as _toks,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    prep = corpus.prepare_training_corpus(docs).persist()
    train_ids = {r.doc_id for r in prep.where(F.col("split") == "train").collect()}
    nontrain = {r.doc_id for r in prep.where(F.col("split") != "train").collect()}
    assert train_ids and nontrain

    train_docs = docs.join(
        prep.where(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    budget = 3000
    mixed = corpus.mix_corpus_temperature(train_docs, 0.7, budget).persist()
    mrows = mixed.collect()
    assert mrows
    assert {r.doc_id for r in mrows} <= train_ids
    assert not ({r.doc_id for r in mrows} & nontrain)

    # temperature law at the seam: every gated source is represented
    # and the total token mass lands near the budget (per-source
    # EXACTNESS of the sampling model is proven in the dedicated
    # mix_corpus tests; per-source deviation here is doc-granularity
    # variance on a tiny fixture, not a property worth asserting)
    sources = {
        r.source
        for r in (
            train_docs.select("source", F.size(_toks(F.col("text"))).alias("n"))
            .where(F.col("n") >= 5)
            .select("source")
            .distinct()
            .collect()
        )
    }
    achieved = {}
    for r in mrows:
        achieved[r.source] = achieved.get(r.source, 0) + r.n_tokens
    assert set(achieved) == sources
    total = sum(achieved.values())
    assert abs(total - budget) / budget < 0.35, total

    # materialize: repeats become independent docs; shard union ≡ mix
    expanded = mixed.join(docs.select("doc_id", "text"), "doc_id").select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"), "text"
    )
    out = str(tmp_path / "shards")
    corpus.write_training_shards(expanded, out, target_tokens=1500)
    back = spark.read.parquet(out)
    assert back.count() == len(mrows)
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id * 100 + r.rep for r in mrows
    }
    n_shards = back.select("shard").distinct().count()
    assert n_shards >= 2
    s0 = corpus.read_training_shard(spark, out, 0).collect()
    keys = [(r.order_key, r.doc_id) for r in s0]
    assert keys == sorted(keys) and keys
    docs.unpersist(), prep.unpersist(), mixed.unpersist()


def test_corpus_prep_with_distilled_quality_model(spark, sf_dir, tmp_path):
    """Model-gated corpus prep: train the hashed linear classifier on
    the heuristic teacher over this corpus (it distills its teacher
    exactly on the training set — verified first), then
    prepare_training_corpus(quality_model_dir=...) must return
    EXACTLY the heuristic-gated flow — same survivors, same columns —
    with the gate now a broadcast weight join."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators import (
        classifier,
        quality,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    labels = quality.quality_signals_ppm(docs).select(
        "doc_id", F.col("quality_ok").cast("double").alias("label")
    )
    md = str(tmp_path / "qprep_model")
    classifier.train_quality_classifier(docs, labels, md, n_buckets=1024)
    flags = (
        classifier.score_quality_from_model(spark, docs, md)
        .join(labels, "doc_id")
        .where(F.col("quality_keep").cast("double") != F.col("label"))
        .count()
    )
    assert flags == 0, "model failed to distill its teacher on the train set"

    got = sorted(map(tuple, corpus.prepare_training_corpus(docs, quality_model_dir=md).collect()))
    want = sorted(map(tuple, corpus.prepare_training_corpus(docs).collect()))
    assert got == want and got
    docs.unpersist()


def test_mix_corpus_temperature_recipe_and_limits(spark, sf_dir):
    """Temperature mixing: the derived recipe must be the p^α law over
    the empirical token shares — α=1 reproduces natural proportions
    (every source's expected rate equal), α=0 splits the budget
    uniformly, and lowering α strictly raises the smallest source's
    share; the sampled output must equal mix_corpus under the derived
    recipe (same machinery, proven by row identity)."""
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.corpus import (
        mix_corpus,
        mix_corpus_temperature,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    base = (
        docs.select("source", F.size(tokens(F.col("text"))).alias("n"))
        .where(F.col("n") >= 5)
        .groupBy("source")
        .agg(F.sum("n").alias("t"))
    )
    totals = {r["source"]: r["t"] for r in base.collect()}
    grand = sum(totals.values())
    total_budget = 4000

    def derived(alpha):
        powed = {s: (t / grand) ** alpha for s, t in totals.items()}
        z = sum(powed.values())
        return {s: int(round(total_budget * p / z)) for s, p in powed.items()}

    for alpha in (0.0, 0.5, 1.0):
        got = sorted(
            map(
                tuple,
                mix_corpus_temperature(docs, alpha, total_budget)
                .select("doc_id", "source", "n_tokens", "rep")
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                mix_corpus(docs, derived(alpha))
                .select("doc_id", "source", "n_tokens", "rep")
                .collect(),
            )
        )
        assert got == want and got, alpha

    # α=0 → uniform budget split; α=1 → proportional to token mass
    r0, r1 = derived(0.0), derived(1.0)
    assert max(r0.values()) - min(r0.values()) <= 1
    for s, t in totals.items():
        assert abs(r1[s] - total_budget * t / grand) <= 1
    # smaller α strictly favors the smallest source
    smallest = min(totals, key=totals.get)
    assert derived(0.3)[smallest] > derived(0.7)[smallest] > r1[smallest]

    import pytest

    with pytest.raises(ValueError, match="alpha"):
        mix_corpus_temperature(docs, -0.1, total_budget)
    docs.unpersist()


def test_mix_corpus_empty_recipe_sources(spark, sf_dir):
    from real_time_cdc_analytics_pipeline_with_clickhouse_spark.operators.corpus import mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    assert mix_corpus(docs, {"no_such_source": 1000}).count() == 0


# ---------------------------------------------------------------------------
# training-shard writer (physical handoff for shuffle_shard_by_tokens)
# ---------------------------------------------------------------------------


def test_write_training_shards_layout_and_order(spark, sf_dir, tmp_path):
    """One dir per shard, exactly one parquet file per dir, rows
    stored already in shuffle order, and the (doc_id -> shard)
    placement identical to the planning operator; the reader returns
    the shard in order with a partition-pruned scan."""
    import os

    import pyarrow.parquet as pq

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    corpus.write_training_shards(docs, out, target_tokens=2048)

    want = {
        r["doc_id"]: (r["shard"], r["order_key"])
        for r in corpus.shuffle_shard_by_tokens(docs, target_tokens=2048).collect()
    }
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) == len({s for s, _ in want.values()})

    got = {}
    for d in shard_dirs:
        files = [f for f in os.listdir(f"{out}/{d}") if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)  # whole shard in one file
        tbl = pq.read_table(f"{out}/{d}/{files[0]}", columns=["doc_id", "order_key"])
        keys = tbl.column("order_key").to_pylist()
        assert keys == sorted(keys), f"{d} not stored in shuffle order"
        s = int(d.split("=", 1)[1])
        for doc_id, k in zip(tbl.column("doc_id").to_pylist(), keys):
            got[doc_id] = (s, k)
    assert got == want

    # reader contract: ordered, pruned to one partition dir
    some_shard = min(s for s, _ in want.values())
    rd = corpus.read_training_shard(spark, out, some_shard)
    rows = rd.select("doc_id", "order_key").collect()
    assert [r["order_key"] for r in rows] == sorted(r["order_key"] for r in rows)
    assert {r["doc_id"] for r in rows} == {
        d for d, (s, _) in want.items() if s == some_shard
    }
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# first-fit-decreasing packing
# ---------------------------------------------------------------------------


def _ffd_model(rows, capacity):
    """Independent Python FFD: rows = [(doc_id, n_tokens)] one shard."""
    fills, out = [], {}
    for doc_id, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        for pid, fill in enumerate(fills):
            if fill + t <= capacity:
                break
        else:
            pid, fill = len(fills), 0
            fills.append(0)
        out[doc_id] = (pid, fill)
        fills[pid] = fill + t
    return out


def test_pack_sequences_ffd_matches_model_and_beats_next_fit(spark, sf_dir):
    """FFD placement must equal an independent Python model shard by
    shard, never overflow capacity (oversize docs alone in a pack),
    place every doc exactly once, and use no more packs than the
    greedy next-fit packer on the same corpus."""
    docs = load_table(spark, sf_dir, "documents")
    cap, shards = 512, 8
    got = corpus.pack_sequences_ffd(docs, capacity=cap, shards=shards).collect()

    base = {
        r["doc_id"]: (r["shard"], r["n_tokens"])
        for r in docs.select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(shards)).cast("int").alias("shard"),
            F.size(
                F.split(
                    F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")),
                    " ",
                )
            ).alias("n_tokens"),
        ).collect()
    }
    assert {r["doc_id"] for r in got} == set(base)  # every doc placed once

    by_shard = {}
    for d, (s, t) in base.items():
        by_shard.setdefault(s, []).append((d, t))
    model = {}
    for s, rows in by_shard.items():
        for d, (pid, off) in _ffd_model(rows, cap).items():
            model[d] = (s, pid, off)
    assert {r["doc_id"]: (r["shard"], r["pack_id"], r["off_tokens"]) for r in got} == model

    # no pack overflows unless it is a single oversize doc
    packs = {}
    for r in got:
        packs.setdefault((r["shard"], r["pack_id"]), []).append(r["n_tokens"])
    for key, sizes in packs.items():
        assert sum(sizes) <= cap or len(sizes) == 1, key

    # padding win: FFD uses no more packs than next-fit, per shard
    nf = corpus.pack_sequences(docs, capacity=cap, shards=shards).collect()
    nf_packs = {}
    ffd_packs = {}
    for r in nf:
        nf_packs[r["shard"]] = max(nf_packs.get(r["shard"], -1), r["pack_id"])
    for r in got:
        ffd_packs[r["shard"]] = max(ffd_packs.get(r["shard"], -1), r["pack_id"])
    assert set(nf_packs) == set(ffd_packs)
    for s in nf_packs:
        assert ffd_packs[s] <= nf_packs[s], s
    assert sum(ffd_packs.values()) < sum(nf_packs.values()), "no padding win on fixture"
