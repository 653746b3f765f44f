"""Similarity search over embedding columns (north star).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; per-query ranking window.  The corpus
  side never shuffles — at 100 TB this is a map-side scan + per-query
  top-k heap (Spark's TakeOrderedAndProject analog per key).
- ``ivf_topk`` — IVF-style approximate variant: corpus pre-bucketed by
  random-hyperplane sign-LSH (seeded Rademacher projections as
  deterministic "centroids"); a query probes only its own bucket.
  Same answer shape, a fraction of the scoring work; recall tunable by
  multi-probing neighbor buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vector import dot, norm
from .dedup import corpus_rows, lsh_bits_for, sign_lsh_bucket


def default_queries(embeddings: DataFrame, every: int = 100) -> DataFrame:
    """Deterministic query subset: every ``every``-th vec_id."""
    return embeddings.where(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )



def _rank_topk(pairs, k: int):
    """Shared rank-and-select contract for every cosine ANN variant
    (brute force, sign-LSH octants, k-means IVF): rank on the 6dp
    cosine (deterministic cross-engine ordering) with a neighbor_id
    tiebreak, but the OUTPUT value is rounded ONCE from the raw
    cosine — a second round of an already-rounded value ties exactly
    at x.xxxx50 and tie-resolution on binary doubles is
    engine-specific.  ``pairs`` must carry query_id/query_vec/qnrm and
    vec_id/embedding/nrm."""
    raw = dot(F.col("query_vec"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm"))
    # a zero-norm vector (signed-hash cancellation CAN zero a tokenful
    # text's embedding) is inert in cosine — it can never be a
    # neighbor or rank one — but an unguarded division would blow up
    # the whole query under ANSI mode; drop both sides' degenerates
    # before scoring
    pairs = pairs.where((F.col("qnrm") > 0) & (F.col("nrm") > 0))
    scored = pairs.where(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(raw, 6).alias("cos6"),
        F.round(raw, 4).alias("cos4"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos6").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", F.col("cos4").alias("cos_sim"))
    )


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query by cosine (query ≠ neighbor).

    Norms are precomputed once per vector (identical value to a
    per-pair norm — same fold over the same array — at 1/3 the work),
    and the corpus is spread across the cluster before scoring.
    """
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    corpus = embeddings.repartition(par, F.col("vec_id")).withColumn("nrm", norm(F.col("embedding")))
    q = queries.withColumn("qnrm", norm(F.col("query_vec")))
    return _rank_topk(corpus.crossJoin(F.broadcast(q)), k)


def _quantize_int8(vec, nrm):
    """L2-normalize then quantize each dim to int8 (×127)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") / nrm * 127).cast("long"))


def quantized_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Int8-quantized cosine top-k — the memory-bound ANN variant.

    Vectors are L2-normalized and quantized to int8 (×127); similarity
    is the exact integer dot product of the quantized vectors (cosine
    ×127² up to quantization error).  At 100 TB this cuts vector
    memory/IO 4× vs float32 and the scoring loop is integer math; as a
    bonus the ranking is integer-exact — no float tolerance anywhere.
    """
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    corpus = embeddings.repartition(par, F.col("vec_id")).select(
        "vec_id", _quantize_int8(F.col("embedding"), norm(F.col("embedding"))).alias("qv")
    )
    q = queries.select(
        "query_id", _quantize_int8(F.col("query_vec"), norm(F.col("query_vec"))).alias("qq")
    )
    scored = corpus.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.aggregate(
            F.zip_with(F.col("qq"), F.col("qv"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("int_dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("int_dot").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "int_dot")
    )


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, bits: int | None = None
) -> DataFrame:
    """Approximate top-k: probe only the query's random-hyperplane
    bucket.  The default ``bits=None`` sizes the bucket space from the
    corpus count (``lsh_bits_for``), keeping per-bucket scoring work
    bounded as the corpus grows (pass explicit bits only to pin a
    reproducible bucket space — the oracle gate does); ``ivf_kmeans_topk`` is the learned-centroid variant
    with explicit ``n_probe`` recall control."""
    if bits is None:
        bits = lsh_bits_for(corpus_rows(embeddings))
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    corpus = embeddings.repartition(par, F.col("vec_id")).select(
        "vec_id", "embedding",
        sign_lsh_bucket("embedding", bits).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = queries.select(
        "query_id", "query_vec",
        sign_lsh_bucket("query_vec", bits).alias("bucket"),
        norm(F.col("query_vec")).alias("qnrm"),
    )
    return _rank_topk(corpus.join(F.broadcast(q), "bucket"), k)


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    seed: int = 7,
    fit_fraction: float | None = None,
):
    """Fit k-means centroids over the embedding column (pyspark.ml).

    Returns ``(model, centroid_df)`` where ``centroid_df`` is
    (centroid_id int, centroid array<double>) — n_centroids × dim,
    genuinely tiny, the one thing in this pipeline that is always safe
    to broadcast.

    ``fit_fraction`` is the 100 TB lever: centroid quality needs only
    a sketch of the distribution, not the full corpus, so the
    10-iteration KMeans fits on a deterministic Bernoulli sample
    (``embeddings.sample(fraction, seed)`` — map-side, no shuffle)
    while ASSIGNMENT stays full-corpus at the caller.  The default
    ``None`` keeps the exact full-corpus fit (every stored-index
    equality test pins that path).  A sample too thin to seat
    ``n_centroids`` distinct centers falls back to the full fit —
    correctness never depends on the fraction chosen."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    full = vecs
    sampled = None
    if fit_fraction is not None and 0.0 < float(fit_fraction) < 1.0:
        sampled = vecs.sample(fraction=float(fit_fraction), seed=seed).persist()
        # one cheap count over the sample (which the fit re-reads from
        # cache): KMeans with fewer points than k would silently return
        # fewer centers and break the manifest's n_centroids geometry
        if sampled.count() >= n_centroids:
            vecs = sampled
        else:
            sampled.unpersist()
            sampled = None
    try:
        model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(vecs)
        if vecs is sampled and len(model.clusterCenters()) < n_centroids:
            # row count is not distinct-POINT count (round-9 advisor):
            # a sample with ≥ k rows but < k distinct vectors still
            # seats fewer centers — validate the fitted geometry and
            # fall back to the full-corpus fit on mismatch, so the
            # manifest's n_centroids is never silently broken
            model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(full)
    finally:
        if sampled is not None:
            sampled.unpersist()
    spark = embeddings.sparkSession
    centroid_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id int, centroid array<double>",
    )
    return model, centroid_df


def ivf_kmeans_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """IVF with *learned* centroids (classic inverted-file ANN): assign
    the corpus to its nearest k-means centroid, probe each query's
    ``n_probe`` nearest cells, brute-force only inside them.

    Plan shape at scale: corpus assignment is ``model.transform`` — a
    map-side JVM pass, no shuffle; the query→cell ranking cross-joins
    the (tiny, broadcast) centroid table against the (small, broadcast)
    query set; the probe join is a broadcast join of (query × probe)
    against the corpus on ``centroid_id``, so the corpus again never
    shuffles.  Scored work ≈ n_probe/n_centroids of brute force, recall
    tunable by ``n_probe`` — the standard IVF trade
    (cf. inverted-file ANN literature, PAPERS.md).
    """
    from pyspark.ml.functions import array_to_vector

    model, centroids = kmeans_centroids(embeddings, n_centroids, seed)
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    corpus = (
        model.transform(
            embeddings.repartition(par, F.col("vec_id")).withColumn(
                "features", array_to_vector(F.col("embedding").cast("array<double>"))
            )
        )
        .select(
            "vec_id",
            "embedding",
            F.col("prediction").alias("centroid_id"),
            norm(F.col("embedding")).alias("nrm"),
        )
    )
    # rank cells per query by squared euclidean distance to the centroid
    d2 = F.aggregate(
        F.zip_with(F.col("query_vec"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("centroid_id"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("d2", d2)
        .withColumn("cell_rnk", F.row_number().over(wq))
        .where(F.col("cell_rnk") <= n_probe)
        .select("query_id", "query_vec", "centroid_id", norm(F.col("query_vec")).alias("qnrm"))
    )
    return _rank_topk(corpus.join(F.broadcast(probes), "centroid_id"), k)


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label mean embedding (+ member count, mean norm): the
    vector-analytics rollup behind cluster inspection and IVF cell
    seeding.

    Element-wise mean via ``posexplode`` → (label, dim) partial
    averages → re-assembled in dim order with ``array_agg`` over a
    sorted collect — two combinable aggregations, shuffle keyed by
    (label, dim) then label; never a per-row Python loop.  Rounded 6dp
    so the assembled array is canonical cross-engine.
    """
    exploded = embeddings.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    by_dim = exploded.groupBy("label", "dim").agg(F.avg("x").alias("m"))
    # element encoded as integer micro-units: double→string formatting
    # is engine-specific (scientific notation thresholds), integers are
    # not
    micro = F.round(F.col("m") * 1_000_000).cast("long")
    centroid = (
        by_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", micro.alias("um")))
            ).alias("pairs")
        )
        .select(
            "label",
            F.transform(F.col("pairs"), lambda s: s["um"].cast("string")).alias("centroid"),
        )
    )
    stats = embeddings.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(norm(F.col("embedding"))), 6).alias("mean_norm"),
    )
    return (
        stats.join(centroid, "label")
        .select(
            "label",
            "n_vecs",
            "mean_norm",
            F.concat_ws(",", "centroid").alias("centroid_um_csv"),
        )
    )


def kmeans_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup-style candidate generation: cosine near-dup pairs
    scored only WITHIN a learned k-means cell (Abbas et al.'s semantic
    dedup keys candidates by cluster; the sign-LSH variant in
    dedup.embedding_near_dup_pairs keys by hyperplane bucket).  Learned
    cells adapt to the corpus geometry, so semantically-clone groups
    co-locate even when correlated dimensions defeat fixed hyperplanes.

    Scale shape: assignment is a map-side model.transform (no shuffle);
    the self-join is an equi-join on centroid_id — per-cell work is
    quadratic in CELL occupancy, so size ``n_centroids`` to the corpus
    (cells ≈ n/target_occupancy) exactly like ``lsh_bits_for``.  Pairs
    straddling a cell boundary are missed — SemDeDup's own documented
    trade; raise n_centroids recall via the LSH multiprobe variant when
    boundary pairs matter.
    """
    from pyspark.ml.functions import array_to_vector

    model, _ = kmeans_centroids(embeddings, n_centroids, seed)
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    assigned = (
        model.transform(
            embeddings.repartition(par, F.col("vec_id")).withColumn(
                "features", array_to_vector(F.col("embedding").cast("array<double>"))
            )
        )
        .select(
            "vec_id", "embedding",
            F.col("prediction").alias("centroid_id"),
            norm(F.col("embedding")).alias("nrm"),
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.centroid_id") == F.col("b.centroid_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.nrm") * F.col("b.nrm")),
            4,
        ).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold)


def semantic_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Semantic dedup keep-set: drop every vector that is the HIGHER id
    of a within-cell near-dup pair (the same greedy keeper rule as
    ``dedup.fuzzy_dedup_keep``, so text-fuzzy and embedding-semantic
    dedup compose predictably in a corpus pipeline).  One anti-join
    after candidate scoring; the invariant (for every within-cell pair
    at ≥ threshold, the higher id is gone) is tested."""
    pairs = kmeans_near_dup_pairs(embeddings, threshold, n_centroids, seed)
    drops = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return embeddings.join(drops, "vec_id", "left_anti")
