"""Passage-level semantic retrieval — the RAG-prep composition of
three already-tested artifacts: ``content_defined_chunks`` (corpus.py)
splits documents at content-defined boundaries, ``embed_documents``
(embedder.py) embeds each chunk, and the persistent IVF index
(ivf_index.py) serves approximate top-k over the chunk vectors.  Doc
ranking is MaxP (the max-passage rule of Dai & Callan, SIGIR 2019:
a document's score is its best passage's score) — the standard
long-document answer, because a relevant passage buried in a long
document would be averaged away by whole-doc embeddings.

Scale shape: chunking and embedding are the map-side paths their own
modules prove; the chunk index is the stock IVF artifact (fit once,
centroid-partitioned inverted lists, probed cells pushed as a static
partition filter), so queries never touch the corpus — and the chunk
id is an INVERTIBLE bit-pack ``doc_id << IDX_BITS | chunk_idx``, so
doc ranking needs NO join at all (the passage table is consulted only
to return the winning snippet, via a broadcast of the bounded hit
list).

The passage index is a composition, so its lifecycle delegates:
updates fold through ``update_ivf_index`` (frozen centroids, batch
dirs), deletes through ``delete_from_ivf_index`` (a doc's chunk pids
tombstone out of the vector index; its rows in the passage TABLE are
then unreachable — no hit can reference them — and the next
``compact_ivf_index`` + ``compact_passage_table`` purge both
physically).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .corpus import CDC_DIVISOR, CDC_SEGMENT, CDC_WINDOW, content_defined_chunks
from .embedder import embed_documents

# chunk_idx lives in the low bits: ≤ ~1M chunks per document and
# ≤ 2^43 (~8.8e12) documents — both comfortable at 100 TB, and both
# guarded at build/update time (assert_true, map-side)
IDX_BITS = 20
_PSG_MANIFEST = "_passage_manifest.json"
# use_pq="auto" breakeven: expected probed rows (n_probe × mean cell
# occupancy) below this don't amortize the per-query ADC lookup-table
# build (ks × dim distance terms vs pq_m-byte-per-row scan savings) —
# calibrated from the round-8 bench, where ~6.8k probed rows ran the
# PQ path 35% SLOWER than float while the 10× corpus (~10× occupancy)
# favored PQ
PQ_AUTO_MIN_PROBED_ROWS = 20_000


def _pid(doc_col, idx_col):
    guard = F.assert_true(
        (doc_col >= 0)
        & (doc_col < F.lit(1 << (63 - IDX_BITS)))
        & (idx_col < F.lit(1 << IDX_BITS)),
        F.lit(
            f"passage pid packing needs 0 <= doc_id < 2^{63 - IDX_BITS} "
            f"and chunk_idx < 2^{IDX_BITS}"
        ),
    )
    packed = doc_col * F.lit(1 << IDX_BITS) + idx_col
    return F.when(guard.isNull(), packed)


def pid_to_doc(pid_col):
    # bit shift, not division: float64 division loses exactness past
    # 2^53 and pids span the full non-negative long range
    return F.shiftrightunsigned(pid_col.cast("long"), IDX_BITS)


def _read_passage_manifest(index_dir: str) -> dict:
    p = os.path.join(index_dir, _PSG_MANIFEST)
    if not os.path.isfile(p):
        raise FileNotFoundError(
            f"no passage index at {index_dir} — run build_passage_index first"
        )
    with open(p) as fh:
        return json.load(fh)


def _chunk_vectors(documents: DataFrame, meta: dict):
    """(pid-keyed chunk vectors, passage rows) for a document set —
    the shared build/update path: chunk ONCE, embed the chunk text,
    keep the (pid, doc_id, chunk_idx, chunk) lookup rows."""
    # single-file corpora arrive as 1-2 scan partitions, and chunking +
    # embedding are the heaviest per-byte map work in the engine —
    # measured at sf0.1, the whole chunk pass ran as ONE task (11.7 s
    # on a 32-core host).  Spread on the dense unique key before the
    # heavy stage (hash-keyed, not round-robin: keyless repartition(n)
    # pays a local sort first — guide §2.5 — and doc_id partitioning
    # is reusable downstream).  Chunking and pid packing are per-doc
    # deterministic, so the split is value-invisible.  The spread is
    # CONDITIONAL on the scan actually being narrower than the
    # cluster: a corpus-scale table arrives as many splits already,
    # and an unconditional repartition there would shuffle the full
    # document text purely to re-spread work that is already spread.
    par = documents.sparkSession.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < par:
        documents = documents.repartition(par, F.col("doc_id"))
    chunks = content_defined_chunks(
        documents,
        window=int(meta["window"]),
        divisor=int(meta["divisor"]),
        segment=int(meta["segment"]),
    ).select(
        _pid(F.col("doc_id"), F.col("chunk_idx")).alias("pid"),
        "doc_id",
        "chunk_idx",
        "chunk",
    )
    vecs = embed_documents(
        chunks.select(F.col("pid"), F.col("chunk").alias("text")),
        dim=int(meta["dim"]),
        id_col="pid",
        out_id_col="vec_id",
        hash_mode=meta["hash_mode"],
    ).where(F.col("n_tokens") > 0)  # tokenless chunks are inert in cosine
    # signed-hash cancellation can zero even a tokenful chunk's
    # vector — equally inert (cosine undefined), and storing it would
    # put a 0-norm row in the scorer's path; drop at the source
    vecs = vecs.where(
        F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + F.abs(x)) > 0
    )
    return vecs.select("vec_id", "embedding"), chunks


def build_passage_index(
    documents: DataFrame,
    index_dir: str,
    dim: int = 64,
    hash_mode: str = "md5",
    n_centroids: int = 16,
    seed: int = 7,
    window: int = CDC_WINDOW,
    divisor: int = CDC_DIVISOR,
    segment: int = CDC_SEGMENT,
    int8: bool = False,
    pq_m: int | None = None,
    pq_ks: int = 16,
    fit_fraction: float | None = None,
) -> None:
    """Chunk → embed → IVF-index the corpus, persist the passage
    lookup table, pin every geometry parameter in the manifest
    (queries and updates resolve from it — a batch chunked or embedded
    differently would land in the wrong space, the LSH-manifest
    failure mode).  One corpus pass; the chunk frame feeds both the
    vectors and the passage table.

    ``pq_m``/``int8`` pass through to the vector index: chunking
    multiplies the vector count ~15× over whole-doc indexing, so the
    PQ/ADC scan-byte tier matters MORE here than anywhere — serve with
    ``passage_topk(use_pq=True)``.  ``fit_fraction`` likewise: the
    chunk corpus is the LARGEST vector set this engine fits KMeans/PQ
    over, so sample-bounding the fits (full-corpus assignment is
    unchanged; the vector manifest pins the fraction for refits)
    matters most here."""
    from .ivf_index import build_ivf_index

    meta = {
        "dim": int(dim),
        "hash_mode": hash_mode,
        "window": int(window),
        "divisor": int(divisor),
        "segment": int(segment),
        "idx_bits": IDX_BITS,
    }
    vecs, chunks = _chunk_vectors(documents, meta)
    # the chunk frame feeds BOTH the passage table and the embedding —
    # cache it so the corpus is chunked once, not once per consumer
    chunks = chunks.persist()
    try:
        # the passage-table write and the vector-index build are
        # independent consumers of the cached chunk frame — overlap
        # them (guide §2.6: the passages write back-fills the KMeans
        # fit's driver-coordinated stage gaps).  The manifest below —
        # the composite's commit — still lands after both, and a crash
        # with either half written replays as a rebuild via the sink's
        # build marker, exactly as the sequential schedule did.
        from .concurrency import overlap_jobs

        def _write_passages():
            chunks.withColumn("batch", F.lit(-1)).write.mode("overwrite").partitionBy(
                "batch"
            ).parquet(f"{index_dir}/passages")

        def _build_vectors():
            build_ivf_index(
                vecs, f"{index_dir}/vectors", n_centroids, seed,
                int8=int8, pq_m=pq_m, pq_ks=pq_ks, fit_fraction=fit_fraction,
            )

        overlap_jobs(
            [_write_passages, _build_vectors], spark=documents.sparkSession
        )
    finally:
        chunks.unpersist()
    tmp = os.path.join(index_dir, _PSG_MANIFEST + ".tmp")
    os.makedirs(index_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(index_dir, _PSG_MANIFEST))


def update_passage_index(
    new_documents: DataFrame, index_dir: str, epoch: int | None = None,
    checkpoint: str | None = None,
) -> None:
    """Fold a document batch in without refit: chunk + embed with the
    manifest's pinned geometry, assign against the frozen centroids
    (``update_ivf_index``), land the passage rows under their own
    ``batch=<id>`` dir — a deterministic whole-directory overwrite, so
    a crash-replayed epoch rewrites identical bytes (the every-index
    exactly-once construction).  ``checkpoint`` is the single-writer
    token (operators/ownership.py), carried by the composite's VECTOR
    manifest (the one every fold flips); the guard probes it before
    the passage rows land."""
    from . import ownership
    from .ivf_index import read_manifest as _read_ivf_manifest
    from .ivf_index import update_ivf_index

    meta = _read_passage_manifest(index_dir)
    # probe BEFORE the passages batch-dir write; the stamp itself
    # commits with the inner update_ivf_index manifest flip
    ownership.claim_writer(
        dict(_read_ivf_manifest(f"{index_dir}/vectors")), checkpoint,
        f"passage index at {index_dir}",
    )
    vecs, chunks = _chunk_vectors(new_documents, meta)
    if epoch is None:
        existing = [
            int(d.split("=", 1)[1])
            for d in os.listdir(f"{index_dir}/passages")
            if d.startswith("batch=")
        ]
        b = max(existing) + 1 if existing else 0
    else:
        b = int(epoch)
    chunks = chunks.persist()  # chunk the batch once for both writes
    try:
        chunks.write.mode("overwrite").parquet(f"{index_dir}/passages/batch={b}")
        update_ivf_index(
            vecs, f"{index_dir}/vectors", epoch=epoch, checkpoint=checkpoint
        )
    finally:
        chunks.unpersist()


def delete_docs_from_passage_index(
    spark: SparkSession, index_dir: str, doc_ids, exclude_batch: int | None = None
) -> None:
    """Takedown by document: every chunk pid of the given doc_ids
    tombstones out of the VECTOR index (``delete_from_ivf_index`` —
    atomic swap, batch-scoped, idempotent), after which no query can
    reach the doc; its passage-table rows are unreachable payload
    until the next compaction purges them physically.  A re-ingested
    doc reuses its pids (the pack is a pure function of doc_id and
    chunk_idx), so the delete also implements the tombstone half of an
    UPSERT: old (pid, batch) pairs die, the re-add's rows land in a
    newer batch the tombstones don't reference.  ``exclude_batch``
    shields one vector batch from victimhood — the streaming sink's
    replay guard (a crash-replayed epoch must not tombstone the rows
    its own previous attempt folded)."""
    from .ivf_index import delete_from_ivf_index
    from .retrieval import _ids_frame

    ids = _ids_frame(spark, doc_ids, "doc_id")
    pids = (
        spark.read.parquet(f"{index_dir}/passages")
        .join(F.broadcast(ids), "doc_id", "left_semi")
        .select(F.col("pid").alias("vec_id"))
        .distinct()
    )
    delete_from_ivf_index(spark, f"{index_dir}/vectors", pids, exclude_batch=exclude_batch)


def compact_passage_table(spark: SparkSession, index_dir: str) -> None:
    """Physically drop passage rows whose vectors no longer live in
    the index (deleted docs, superseded batches) and squash replay
    residue — one staged whole-tree swap under a fresh batch id, the
    ``compact_phash_index`` construction."""
    from .ivf_index import _live_assignments
    from .retrieval import _swap_tree

    root = f"{index_dir}/passages"
    live_pids = _live_assignments(spark, f"{index_dir}/vectors").select(
        F.col("vec_id").alias("pid")
    )
    rows = spark.read.parquet(root)
    existing = [
        int(d.split("=", 1)[1]) for d in os.listdir(root) if d.startswith("batch=")
    ]
    newb = min(existing + [-1]) - 1
    # latest batch wins per pid: a re-ingested doc reuses its pids, so
    # an older batch's row carries the superseded TEXT
    wpid = Window.partitionBy("pid").orderBy(F.col("batch").desc())
    kept = (
        rows.withColumn("_rn", F.row_number().over(wpid))
        .where(F.col("_rn") == 1)
        .drop("_rn", "batch")
        .join(live_pids, "pid", "left_semi")
        .withColumn("batch", F.lit(newb))
    )
    stage = root + "__stage"
    kept.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).partitionBy("batch").parquet(stage)
    _swap_tree(stage, root)


def refit_passage_index(
    spark: SparkSession,
    index_dir: str,
    n_centroids: int | None = None,
    fit_fraction: float | None = None,
) -> None:
    """Versioned centroid refit for the chunk-vector index — the
    passage twin of ``refit_ivf_index``, which it delegates to (the
    vector tree IS a plain IVF artifact).  The chunk space is the most
    drift-exposed vector set the engine maintains: chunking multiplies
    vectors ~15× and a domain-drifting corpus shifts chunk space
    first, so this is where the drift hook pays most.

    What the refit must preserve — and does, by construction:

    - **pid invertibility**: the refit re-clusters the LIVE rows and
      re-assigns them under fresh centroids, but every row keeps its
      ``vec_id`` (= pid); ``pid_to_doc`` is a pure bit-unpack, so doc
      ranking survives any centroid geometry.
    - **passage-table reachability**: ``passage_topk``'s snippet join
      keys on pid against ``passages/`` — untouched by the vector
      version swap, so every post-refit hit still resolves its text.
    - **atomicity**: readers resolve through the vector manifest's
      ``data_version`` pointer (one ``os.replace``) — old-in-full
      until the swap, new-in-full after, never a mix; a crash
      mid-build leaves the pointer (and the serving index) untouched.

    The chunk/embed geometry in the PASSAGE manifest is not refit —
    it is the identity of the pid space; changing it is a rebuild,
    not a refit."""
    from .ivf_index import refit_ivf_index

    _read_passage_manifest(index_dir)  # fail fast on a non-passage dir
    refit_ivf_index(
        spark,
        f"{index_dir}/vectors",
        n_centroids=n_centroids,
        fit_fraction=fit_fraction,
    )


def passage_topk(
    spark: SparkSession,
    queries: DataFrame,
    index_dir: str,
    k: int = 5,
    n_probe: int = 4,
    k_chunks: int | None = None,
    use_pq: bool | str = False,
    pq_rerank: int = 0,
) -> DataFrame:
    """MaxP document top-k: embed the text queries with the manifest's
    pinned geometry, take the chunk-level IVF top-``k_chunks``
    (default 4·k), score each doc by its BEST chunk, return the top
    ``k`` docs per query WITH the winning snippet.

    ``use_pq="auto"`` picks the tier from the vector manifest's cell
    occupancy: the ADC path pays a per-query lookup-table build
    (``ks × dim`` distance terms) before its cheap ``pq_m``-byte scan,
    so it only wins once the probed rows amortize it — round 8's bench
    measured the PQ path SLOWER at sf0.1 (3.38 s vs 2.50 s float;
    probed cells held ~1.7k vectors) while the 10× chunk corpus
    favored it.  Auto compares expected probed rows
    (``n_probe × n_rows / n_centroids``) against
    ``PQ_AUTO_MIN_PROBED_ROWS`` and falls back to float below it (or
    when the index stores no PQ codes) — small deployments never pay
    the LUT tax, large ones never miss the scan-byte win.

    Exactness of the aggregation: scanning chunks in score order
    yields docs in MaxP order (a doc's first appearance IS its max),
    so the doc ranking is exact over the probed cells whenever the
    chunk list covers ``k`` distinct docs — raise ``k_chunks`` (or
    ``n_probe``) if long documents dominate the neighborhood.  Doc ids
    come from the pid bit-pack (no join); the passage table is touched
    only by a broadcast of the bounded winner list to fetch snippets.

    ``use_pq=True`` routes the chunk ranking through the IVF-PQ/ADC
    tier (``pq_rerank`` exact-rescored candidates; with rerank ≥ cell
    occupancy the answer EQUALS the float path — tested) — at chunk
    granularity the corpus holds ~15× more vectors than whole-doc
    indexing, so the pq_m-bytes-per-vector scan is where PQ pays most.

    Output: (query_id, doc_id, rnk, score, chunk_idx, chunk)."""
    from .ivf_index import ivf_index_topk, ivf_index_topk_pq, read_manifest

    meta = _read_passage_manifest(index_dir)
    kc = (4 * k) if k_chunks is None else int(k_chunks)
    if use_pq == "auto":
        vmeta = read_manifest(f"{index_dir}/vectors")
        if not vmeta.get("pq_m"):
            use_pq = False
        else:
            occupancy = vmeta["n_rows"] / max(int(vmeta["n_centroids"]), 1)
            use_pq = n_probe * occupancy >= PQ_AUTO_MIN_PROBED_ROWS
    # the shared ANN ranker excludes vec_id == query_id self-pairs;
    # pids are non-negative by the pack guard, so mapping query ids
    # into the NEGATIVE range makes collision impossible (restored on
    # output) — callers never have to reason about id spaces
    qv = (
        embed_documents(
            queries,
            dim=int(meta["dim"]),
            id_col="query_id",
            out_id_col="query_id",
            hash_mode=meta["hash_mode"],
        )
        .where(F.col("n_tokens") > 0)
        .select(
            # the remap assumes non-negative caller ids — a negative
            # one would land in the pid space, where the ranker's
            # vec_id != query_id self-pair exclusion could silently
            # drop a legitimate chunk hit.  Guard loudly, exactly as
            # _pid guards doc ids (map-side assert, no extra job).
            F.when(
                F.assert_true(
                    F.col("query_id") >= 0,
                    F.concat(
                        F.lit("passage_topk: negative query_id "),
                        F.col("query_id").cast("string"),
                        F.lit(" collides with the pid space"),
                    ),
                ).isNull(),
                -F.col("query_id") - 1,
            ).alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    if use_pq:
        hits = ivf_index_topk_pq(
            spark, qv, f"{index_dir}/vectors", k=kc, n_probe=n_probe,
            rerank=max(int(pq_rerank), kc),
        )
    else:
        hits = ivf_index_topk(
            spark, qv, f"{index_dir}/vectors", k=kc, n_probe=n_probe
        )
    # MaxP via the CHUNK rank (6dp-cosine order with pid tie-break —
    # the engine's deterministic ranking), not the 4dp display score:
    # a doc's first appearance in chunk order IS its max, so min-rnk
    # per doc yields docs in exact MaxP order
    wdoc = Window.partitionBy("query_id", "doc_id").orderBy(F.col("rnk"))
    wq = Window.partitionBy("query_id").orderBy(F.col("best_rnk"))
    best = (
        hits.withColumn("doc_id", pid_to_doc(F.col("neighbor_id")))
        .withColumn("_rn", F.row_number().over(wdoc))
        .where(F.col("_rn") == 1)
        .select(
            "query_id",
            "doc_id",
            F.col("neighbor_id").alias("pid"),
            F.col("cos_sim").alias("score"),
            F.col("rnk").alias("best_rnk"),
        )
        .withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= k)
    )
    # snippet lookup: a re-ingested doc reuses its pids, so the join
    # takes the LATEST batch's row (older rows carry superseded text);
    # this also squashes replay residue deterministically
    passages = spark.read.parquet(f"{index_dir}/passages").select(
        "pid", "chunk_idx", "chunk", "batch"
    )
    wlatest = Window.partitionBy("query_id", "doc_id").orderBy(F.col("batch").desc())
    return (
        passages.join(F.broadcast(best), "pid")
        .withColumn("_ln", F.row_number().over(wlatest))
        .where(F.col("_ln") == 1)
        .select(
            (-F.col("query_id") - 1).alias("query_id"),
            "doc_id",
            "rnk",
            "score",
            "chunk_idx",
            "chunk",
        )
    )


def refresh_passage_index_from_diff(
    spark: SparkSession,
    index_dir: str,
    old_documents: DataFrame,
    new_documents: DataFrame,
    epoch: int | None = None,
) -> None:
    """Fold a corpus-snapshot transition into the passage index from
    ``corpus_diff``'s work-list — the diff-refresh leg every stored
    artifact in this engine carries: removed/changed docs tombstone
    their chunk vectors out, added/changed docs chunk + embed ONCE and
    fold in against the frozen centroids.  Cost ∝ diff; the unchanged
    corpus is never re-chunked.  A changed doc's re-add lands in a
    batch its tombstones don't reference (pids are deterministic, so
    the new version simply supersedes — ``passage_topk`` resolves
    snippets latest-batch-first).  Refreshed ≡ fresh build on the new
    snapshot (tested)."""
    from .corpus import corpus_diff

    diff = corpus_diff(old_documents, new_documents).persist()
    try:
        gone = diff.where(F.col("change").isin("removed", "changed")).select("doc_id")
        fresh = new_documents.join(
            diff.where(F.col("change").isin("added", "changed")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        if not gone.isEmpty():
            delete_docs_from_passage_index(spark, index_dir, gone)
        if not fresh.isEmpty():
            update_passage_index(fresh, index_dir, epoch=epoch)
    finally:
        diff.unpersist()


def hybrid_passage_topk_from_indexes(
    spark: SparkSession,
    text_index_dir: str,
    passage_index_dir: str,
    query_terms: list,
    query_text: str,
    k: int = 10,
    k_each: int = 10,
    n_probe: int = 4,
    c: int = 60,
) -> DataFrame:
    """Doc-level hybrid serving with a PASSAGE-level semantic leg —
    the long-document upgrade of ``retrieval.hybrid_topk_from_indexes``
    (whose semantic leg scores whole-doc vectors): BM25 over the
    stored inverted text index fused by RRF with MaxP over the chunk
    IVF index.  Both legs are pruned index reads (term buckets /
    probed cells); fusion is list-sized.  The semantic list enters the
    fuser under the passage ranking's OWN deterministic order (the
    producer's rank, not a re-sort of the 4dp display score), so the
    fusion ≡ component-wise ``rrf_fuse`` exactly (tested)."""
    from .retrieval import bm25_topk_from_index, rrf_fuse

    lex = bm25_topk_from_index(spark, text_index_dir, query_terms, k=k_each).select(
        "doc_id", "bm25"
    )
    q = spark.createDataFrame([(0, query_text)], "query_id long, text string")
    sem = passage_topk(
        spark, q, passage_index_dir, k=k_each, n_probe=n_probe, use_pq="auto"
    ).select("doc_id", (-F.col("rnk")).cast("double").alias("cos_sim"))
    return rrf_fuse(lex, sem, k=k, c=c)


def hybrid_passage_topk_batch_from_indexes(
    spark: SparkSession,
    text_index_dir: str,
    passage_index_dir: str,
    queries: DataFrame,
    k: int = 10,
    k_each: int = 10,
    n_probe: int = 4,
    c: int = 60,
) -> DataFrame:
    """Batch form of ``hybrid_passage_topk_from_indexes`` — one job for
    a whole query SET (the throughput shape a serving node runs):
    the lexical leg is ``bm25_topk_batch_from_index`` (one pruned
    postings read for the union of query terms), the semantic leg is
    ``passage_topk``'s already-batched MaxP ranking (one pruned
    inverted-list read for the union of probed cells), and RRF fusion
    runs per query under one query-partitioned window — never a
    per-query Spark job.  ``queries`` is (query_id, terms
    array<string>, text).  Per query ≡ the one-query hybrid call
    (tested)."""
    from .retrieval import _rrf_core, bm25_topk_batch_from_index

    lex = bm25_topk_batch_from_index(
        spark, text_index_dir, queries.select("query_id", "terms"), k=k_each
    )
    sem = passage_topk(
        spark,
        queries.select("query_id", "text"),
        passage_index_dir,
        k=k_each,
        n_probe=n_probe,
        use_pq="auto",
    ).select("query_id", "doc_id", (-F.col("rnk")).cast("double").alias("cos_sim"))
    return _rrf_core(lex, sem, k, c, keys=["query_id"])
