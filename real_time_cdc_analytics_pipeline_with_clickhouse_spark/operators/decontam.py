"""Cross-corpus decontamination — keeping evaluation data out of the
training corpus at 100 TB scale.

Document-level n-gram overlap (``dedup.decontaminate``) catches exact
phrase leakage; this module adds the two harder production flows:

- **fuzzy decontamination** — a training doc that is a *near*-dup of a
  benchmark doc (reworded, reformatted, partially quoted) shares few
  exact n-grams but a high MinHash-Jaccard.  ``fuzzy_decontaminate``
  runs the same banded-LSH candidate generation the dedup family uses,
  but *across* corpora: train bands equi-join benchmark bands, exact
  Jaccard verifies candidates, and every training doc gets a
  ``contaminated`` verdict.  The benchmark side is small by
  construction (eval sets are thousands of docs, not billions), so its
  band table broadcasts and the 100 TB training side never shuffles —
  candidate cost ∝ collisions, never |train|×|bench|.
- **index-backed decontamination** — benchmarks are a curated artifact
  that changes rarely; ``decontaminate_against_index`` answers the
  same question off a persisted MinHash index
  (``lsh_index.build_minhash_index`` over the benchmark corpus), so a
  streaming ingest can gate every arriving batch without re-hashing
  the benchmark, and benchmark takedowns (tombstones) stop acting as
  contamination precedent immediately.
- **span excision** — dropping a whole 50 kB document over one leaked
  question wastes data; the surgical alternative (the Lee et al. /
  GPT-3-appendix style n-gram decontamination) removes only the token
  spans covered by a benchmark n-gram.  ``excise_contaminated_spans``
  finds every training-token position opening a benchmark n-gram,
  merges the covered windows JVM-side, and rebuilds the surviving
  token stream — one broadcast join plus one doc-keyed aggregation,
  no Python in the row path.

Reference parity note: the reference pipeline (ESJ enrichment +
ClickHouse rollups) has no training-data surface; this family is part
of the repo's mandated LLM-pipeline extension set, built on the same
shingle/MinHash primitives as the dedup operators so the DuckDB-twinned
hash family is shared end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.text import shingles, tokens
from .dedup import BAND_SIZE, N_MINHASH, _doc_shingles
from .lsh_index import _verified, minhash_band_entries


def _cross_verified(
    doc_bands: DataFrame,
    bench_bands: DataFrame,
    doc_sh: DataFrame,
    bench_sh: DataFrame,
    threshold: float,
    broadcast_benchmark: bool,
) -> DataFrame:
    """Verified (doc_id, bench_id) near-dup pairs across two corpora.

    Candidates are the banded equi-join; when the benchmark side is
    broadcast the training side stays map-side for candidate
    generation (its only shuffles are the per-pair verification aggs,
    cost ∝ candidates).  Ids may collide across the two tables — the
    verification keeps the sides in separate columns/frames
    throughout, so a train doc 5 never aliases bench doc 5."""
    bb = bench_bands.select(
        F.col("doc_id").alias("bench_id"), "band_id", "band_key"
    )
    if broadcast_benchmark:
        bb = F.broadcast(bb)
    cand = (
        doc_bands.join(bb, ["band_id", "band_key"])
        .select(F.col("doc_id").alias("doc_a"), F.col("bench_id").alias("doc_b"))
        .distinct()
    )
    return _verified(
        cand,
        doc_sh.select("doc_id", "shingle"),
        bench_sh.select("doc_id", "shingle"),
        threshold,
    ).select(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("bench_id"))


def _flag(documents: DataFrame, verified: DataFrame) -> DataFrame:
    hits = verified.groupBy("doc_id").agg(
        F.countDistinct("bench_id").alias("n_bench_matches")
    )
    return (
        documents.select("doc_id", "lang", "source")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.coalesce("n_bench_matches", F.lit(0)).alias("n_bench_matches"),
            (F.coalesce("n_bench_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def fuzzy_decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    k: int = N_MINHASH,
    band: int = BAND_SIZE,
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
    hash_mode: str = "md5",
) -> DataFrame:
    """Flag training docs that are MinHash near-dups of any benchmark
    doc: banded-LSH candidates across corpora, exact-Jaccard verified.

    Returns every input doc with ``n_bench_matches`` (distinct verified
    benchmark near-dups) and ``contaminated``.  Soundness is exact —
    a flagged doc really has Jaccard ≥ ``threshold`` with a benchmark
    doc; recall is the LSH band-collision guarantee (certain at
    Jaccard 1.0, tunable via k/band).  Set
    ``broadcast_benchmark=False`` for an unusually large eval corpus —
    candidates then come from a shuffle equi-join on the band key.
    ``hash_mode="xxh64"`` swaps both sides' MinHash family for the
    codegen'd production hash (verification is exact Jaccard either
    way — the mode changes which candidates surface, never whether a
    surfaced flag is sound)."""
    ex_d = _doc_shingles(documents, n).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    ex_b = _doc_shingles(benchmark, n).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    verified = _cross_verified(
        minhash_band_entries(documents, n, k, band, hash_mode),
        minhash_band_entries(benchmark, n, k, band, hash_mode),
        ex_d,
        ex_b,
        threshold,
        broadcast_benchmark,
    )
    return _flag(documents, verified)


def decontaminate_against_index(
    spark: SparkSession,
    documents: DataFrame,
    index_dir: str,
    n: int | None = None,
    k: int | None = None,
    band: int | None = None,
    threshold: float = 0.5,
    hash_mode: str | None = None,
) -> DataFrame:
    """``fuzzy_decontaminate`` against a PERSISTED benchmark MinHash
    index (``lsh_index.build_minhash_index``): per-batch cost ∝ batch,
    the benchmark is never re-shingled, and tombstoned (taken-down)
    benchmark docs stop flagging immediately.

    The index side joins by (band_id, band_key) without a broadcast —
    the artifact is already partitioned by band_id, and an index can
    outgrow the driver even when one benchmark snapshot wouldn't.
    Equivalence with the fit-per-call flow is tested exactly
    (flags ≡ ``fuzzy_decontaminate(documents, benchmark)``).  LSH
    params resolve from the index manifest, so the arriving batch is
    always hashed with the family the benchmark artifact was built
    with (``None`` = pinned value; a contradiction raises)."""
    from .lsh_index import (
        _artifact_grid,
        _bands_layout,
        _dbucket_col,
        _kbucket_col,
        _live_bands,
        _live_shingles,
        _require_batched,
        _resolve_lsh_params,
        _shingle_rows,
        _shingles_layout,
        _verified,
    )

    _require_batched(index_dir)
    n, k, band, hash_mode = _resolve_lsh_params(index_dir, n, k, band, hash_mode)
    batch_bands = minhash_band_entries(documents, n, k, band, hash_mode)
    # key-bucketed benchmark artifacts (lsh_index module docstring)
    # prune both corpus-side reads to the batch's partitions — same
    # move as dedup_against_index, bounded collects, checkpointed
    # result so the intermediates can unpersist.  The pruning modulus
    # is the artifact's manifest-pinned grid; unannotated bucketed
    # trees are never pruned (lsh_index._artifact_grid)
    mk, md = (
        _artifact_grid(index_dir, spark)
        if _bands_layout(index_dir) == "bucketed"
        or _shingles_layout(index_dir) == "bucketed"
        else (None, None)
    )
    bucket_bands = mk is not None and _bands_layout(index_dir) == "bucketed"
    bucket_sh = md is not None and _shingles_layout(index_dir) == "bucketed"
    # the eager pruning machinery engages only when the batch's bucket
    # coverage is a small fraction of the grid (lsh_index's rule) — a
    # corpus-sized training batch saturates every bucket and takes the
    # plain lazy path
    pruned = False
    pairs = None
    if bucket_bands:
        batch_bands = batch_bands.persist()
        pairs = [
            (r["band_id"], r["kb"])
            for r in batch_bands.select(
                "band_id", _kbucket_col(F.col("band_key"), mk).alias("kb")
            )
            .distinct()
            .collect()
        ]
        if len(pairs) > ((k // band) * mk) // 2:
            pairs = None
            batch_bands.unpersist()
        else:
            pruned = True
    bucket_sh = bucket_sh and pruned
    # the live readers anti-join (doc_id, batch)-scoped tombstones, so
    # a taken-down benchmark doc stops flagging immediately
    idx_bands = _live_bands(spark, index_dir, band_pairs=pairs)
    bb = idx_bands.select(F.col("doc_id").alias("bench_id"), "band_id", "band_key")
    cand = (
        batch_bands.join(bb, ["band_id", "band_key"])
        .select(F.col("doc_id").alias("doc_a"), F.col("bench_id").alias("doc_b"))
        .distinct()
    )
    if bucket_sh:
        cand = cand.persist()
        dbl = [
            r["db"]
            for r in cand.select(_dbucket_col(F.col("doc_b"), md).alias("db"))
            .distinct()
            .collect()
        ]
        idx_sh = _live_shingles(
            spark, index_dir, dbuckets=dbl if len(dbl) < md else None
        )
    else:
        idx_sh = _live_shingles(spark, index_dir)
    verified = _verified(cand, _shingle_rows(documents, n), idx_sh, threshold).select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("bench_id")
    )
    flags = _flag(documents, verified)
    if pruned:
        flags = flags.localCheckpoint(eager=True)
        batch_bands.unpersist()
        if bucket_sh:
            cand.unpersist()
    return flags


def semantic_decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    bits: int | None = None,
    hash_mode: str = "md5",
) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space rung above the
    n-gram flows: a training doc whose EMBEDDING sits within cosine
    ``threshold`` of a benchmark doc is flagged even when rewording
    left too few shared shingles for the MinHash gate (the SemDeDup
    observation applied to eval leakage).  Both corpora embed with the
    deterministic feature-hash embedder (``embedder.embed_documents``
    — swap in learned vectors upstream by passing pre-embedded frames
    to ``semantic_decontaminate_vectors``), candidates come from a
    radius-1 multiprobe sign-LSH bucket join (the
    ``multiprobe_embedding_near_dup_pairs`` recall construction,
    cross-corpus: the small benchmark side explodes to bits+1 probe
    buckets and BROADCASTS), and every candidate is verified with the
    exact cosine — a flagged doc really is ≥ ``threshold``-close to a
    benchmark doc.

    Scale shape: the 100 TB training side computes its bucket
    map-side and equi-joins the broadcast probe table — no corpus
    shuffle beyond its own embedding aggregation, no |train|×|bench|
    anything.  Returns every input doc with ``n_bench_matches``
    (distinct verified benchmark neighbors) and ``contaminated`` —
    the ``fuzzy_decontaminate`` output contract, so the two gates
    compose by OR.
    """
    from .embedder import embed_documents

    d = embed_documents(documents, dim=dim, hash_mode=hash_mode).where(
        F.col("n_tokens") > 0
    )
    b = embed_documents(benchmark, dim=dim, hash_mode=hash_mode).where(
        F.col("n_tokens") > 0
    )
    verified = semantic_decontaminate_vectors(d, b, threshold, bits, dim=dim)
    return _flag(documents, verified)


def semantic_decontaminate_vectors(
    doc_vecs: DataFrame,
    bench_vecs: DataFrame,
    threshold: float = 0.9,
    bits: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """The vector-level core of ``semantic_decontaminate``: both sides
    are (vec_id, embedding) frames (any embedder — the feature-hash
    default or learned vectors).  Returns verified (doc_id, bench_id)
    pairs with cosine ≥ ``threshold``.  The benchmark side explodes to
    its own bucket plus the ``bits`` radius-1 sign-flip probes and
    broadcasts (eval corpora are thousands of rows; (bits+1)×|bench|
    stays driver-safe), so a pair split by one near-zero hyperplane
    projection still meets in a bucket."""
    from ..functions.vector import dot, norm
    from .dedup import corpus_rows, lsh_bits_for, sign_lsh_bucket

    if bits is None:
        bits = lsh_bits_for(corpus_rows(doc_vecs))
    d = doc_vecs.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("_dv"),
        sign_lsh_bucket("embedding", bits).alias("bucket"),
        norm(F.col("embedding")).alias("_dn"),
    )
    b = bench_vecs.select(
        F.col("vec_id").alias("bench_id"),
        F.col("embedding").alias("_bv"),
        sign_lsh_bucket("embedding", bits).alias("_b0"),
        norm(F.col("embedding")).alias("_bn"),
    )
    probes = b.select(
        "bench_id",
        "_bv",
        "_bn",
        F.explode(
            F.array(
                F.col("_b0"),
                *[F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(bits)],
            )
        ).alias("bucket"),
    )
    return (
        d.join(F.broadcast(probes), "bucket")
        # zero vectors (no content) are inert on EITHER side — and the
        # guard must precede the division (ANSI mode errors on /0
        # rather than yielding NULL)
        .where((F.col("_dn") > 0) & (F.col("_bn") > 0))
        .select(
            "doc_id",
            "bench_id",
            (
                dot(F.col("_dv"), F.col("_bv"))
                / (F.col("_dn") * F.col("_bn"))
            ).alias("_cos"),
        )
        .where(F.col("_cos") >= threshold)
        .select("doc_id", "bench_id")
        .distinct()
    )


_VECS_MANIFEST = "_bench_vectors_manifest.json"


def build_benchmark_vectors(
    benchmark: DataFrame, vec_dir: str, dim: int = 64, hash_mode: str = "md5"
) -> None:
    """Persist a benchmark's embedding table as a frozen artifact —
    the SEMANTIC analog of the benchmark MinHash index and n-gram set:
    ``(bench_id, embedding)`` parquet plus a manifest pinning
    (dim, hash_mode), so a streaming ingest can run the
    embedding-cosine gate per batch without re-embedding the benchmark
    and, crucially, always embeds the ARRIVING side in the same space
    (the LSH-manifest discipline: a doc embedded with a different dim
    or hash family would silently never sit near any benchmark vector
    — every leak "survives", the worst gate failure mode).
    Zero-token benchmark docs are excluded at build (they are inert in
    the cosine anyway)."""
    import json
    import os

    from .embedder import embed_documents

    vecs = (
        embed_documents(benchmark, dim=dim, hash_mode=hash_mode)
        .where(F.col("n_tokens") > 0)
        .select(F.col("vec_id").alias("bench_id"), "embedding")
    )
    vecs.coalesce(1).write.mode("overwrite").parquet(f"{vec_dir}/vectors")
    tmp = os.path.join(vec_dir, _VECS_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"dim": int(dim), "hash_mode": hash_mode}, fh)
    os.replace(tmp, os.path.join(vec_dir, _VECS_MANIFEST))


def semantic_decontaminate_against_vectors(
    spark: SparkSession,
    documents: DataFrame,
    vec_dir: str,
    threshold: float = 0.9,
    bits: int | None = None,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """``semantic_decontaminate`` against a PERSISTED benchmark vector
    artifact (``build_benchmark_vectors``): the benchmark is never
    re-embedded, the arriving docs embed with the artifact's pinned
    (dim, hash_mode), and the output keeps the ``fuzzy_decontaminate``
    contract (``n_bench_matches``, ``contaminated``) so every gate
    composes by OR.  Equivalence with the fit-per-call flow is tested
    exactly.

    ``embeddings`` = the one-embed reuse path (the unified document
    ingest sink embeds each micro-batch once and hands the vectors to
    every consumer): a (vec_id, embedding, n_tokens) frame covering
    ``documents``' doc_ids, embedded with the artifact's EXACT pinned
    (dim, hash_mode) — the dim half is guarded map-side; the
    hash_mode half is the caller's contract (the sink validates it
    against the artifact manifest and falls back to embedding here
    when it differs)."""
    import json
    import os

    from .embedder import embed_documents

    mp = os.path.join(vec_dir, _VECS_MANIFEST)
    if not os.path.isfile(mp):
        raise FileNotFoundError(
            f"no benchmark vector artifact at {vec_dir} — run "
            "build_benchmark_vectors first"
        )
    with open(mp) as fh:
        meta = json.load(fh)
    if embeddings is not None:
        guard = F.assert_true(
            F.size("embedding") == int(meta["dim"]),
            F.lit(
                f"precomputed embeddings must match the benchmark "
                f"artifact's pinned dim={meta['dim']}"
            ),
        )
        d = (
            embeddings.where(F.col("n_tokens") > 0)
            .select(
                "vec_id",
                F.when(guard.isNull(), F.col("embedding")).alias("embedding"),
                "n_tokens",
            )
        )
    else:
        d = embed_documents(
            documents, dim=int(meta["dim"]), hash_mode=meta["hash_mode"]
        ).where(F.col("n_tokens") > 0)
    b = spark.read.parquet(f"{vec_dir}/vectors").select(
        F.col("bench_id").alias("vec_id"), "embedding"
    )
    verified = semantic_decontaminate_vectors(
        d, b, threshold, bits, dim=int(meta["dim"])
    )
    return _flag(documents, verified)


_GRAMS_MANIFEST = "_ngrams_manifest.json"


def build_benchmark_ngrams(
    benchmark: DataFrame, ngram_dir: str, n: int = 8
) -> None:
    """Persist a benchmark's distinct n-gram set as a frozen artifact
    (grams parquet + manifest pinning ``n``) — the excision analog of
    the benchmark MinHash index, so a streaming ingest can excise
    every arriving batch without re-tokenizing the benchmark."""
    import json
    import os

    grams = (
        benchmark.select(F.explode(shingles(F.col("text"), n)).alias("gram"))
        .where(F.col("gram") != "")
        .distinct()
    )
    grams.coalesce(1).write.mode("overwrite").parquet(f"{ngram_dir}/grams")
    tmp = os.path.join(ngram_dir, _GRAMS_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"n": int(n)}, fh)
    os.replace(tmp, os.path.join(ngram_dir, _GRAMS_MANIFEST))


def excise_from_ngram_index(
    spark: SparkSession, documents: DataFrame, ngram_dir: str
) -> DataFrame:
    """``excise_contaminated_spans`` against a persisted benchmark
    n-gram artifact (``build_benchmark_ngrams``): the benchmark is
    never re-tokenized, and ``n`` comes from the artifact manifest so
    the window math can't drift from the stored gram set.  Proven ≡
    the fit-per-call operator."""
    import json
    import os

    p = os.path.join(ngram_dir, _GRAMS_MANIFEST)
    if not os.path.isfile(p):
        raise FileNotFoundError(
            f"no benchmark n-gram set at {ngram_dir} — run "
            "build_benchmark_ngrams first"
        )
    with open(p) as fh:
        n = json.load(fh)["n"]
    return _excise(documents, spark.read.parquet(f"{ngram_dir}/grams"), n)


def excise_contaminated_spans(
    documents: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """Remove ONLY the benchmark-overlapping token spans from each
    training document, keeping the rest — the surgical alternative to
    dropping whole docs (the n-gram decontamination of the GPT-3
    appendix / Lee et al., with window merging instead of doc drops).

    A position ``p`` in a doc's normalized token stream is *covered*
    when some benchmark n-gram equals tokens ``[p, p+n)`` for a window
    opening at or before it; overlapping windows merge by position-set
    union.  Returns (doc_id, lang, source, text, n_removed_tokens)
    where ``text`` is the surviving NORMALIZED token stream (same
    normalization contract as ``remove_repeated_passages``) — empty
    when the whole doc is benchmark material.

    Caveat (inherent to excision, documented by Lee et al.): splicing
    the prefix and suffix of a removed span can in principle mint a
    NEW benchmark n-gram at the junction; run the overlap detector
    after excision when a hard guarantee is needed.

    Scale shape: the benchmark n-gram set is distinct'd and broadcast
    (eval-corpus-sized); per-doc work is one generate-grams projection,
    the broadcast equi-join, a doc-keyed covered-position aggregation,
    and a doc-keyed rebuild join — the 100 TB side shuffles once, on
    its own doc_id."""
    bench_grams = (
        benchmark.select(F.explode(shingles(F.col("text"), n)).alias("gram"))
        .where(F.col("gram") != "")
        .distinct()
    )
    return _excise(documents, bench_grams, n)


def _excise(documents: DataFrame, bench_grams: DataFrame, n: int) -> DataFrame:
    """The excision core over an already-materialized benchmark gram
    frame — shared by the fit-per-call and artifact-backed entry
    points."""
    tok = tokens(F.col("text"))
    grams = (
        documents.select(
            "doc_id",
            F.posexplode(
                F.when(
                    F.size(tok) >= n, shingles(F.col("text"), n)
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos", "gram"),
        )
    )
    covered = (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(F.sequence(F.col("pos"), F.col("pos") + (n - 1)))
                    )
                )
            ).alias("covered")
        )
    )
    # rebuild via array_except (hashed right side, O(tokens+covered)
    # per row — a per-token array_contains would be O(tokens×covered),
    # quadratic on a fully-covered long doc); positions are unique so
    # array_except's left-dedup is a no-op, and it preserves left order
    kept_pos = F.array_except(
        F.sequence(F.lit(0), F.size(tok) - 1), F.col("covered")
    )
    kept = F.transform(kept_pos, lambda p: F.element_at(tok, (p + 1).cast("int")))
    return (
        documents.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.when(F.col("covered").isNull(), F.concat_ws(" ", tok))
            .otherwise(F.concat_ws(" ", kept))
            .alias("text"),
            F.coalesce(F.size("covered"), F.lit(0)).alias("n_removed_tokens"),
        )
    )
