"""Similarity search over embedding columns (``array<float>``).

Two tiers:

* **brute-force cosine top-k** — the correctness baseline: broadcast the
  (small) query set, score every corpus row, rank per query. One broadcast,
  zero shuffles until the final per-query top-k.
* **sign-LSH bucketed ANN** — the scale path: bucket = sign pattern of the
  first ``b`` dimensions (a fixed, data-independent hyperplane family —
  deterministic and SQL-expressible, so the oracle can reproduce it).
  Queries only score candidates in their own bucket: at 10^12 vectors the
  equi-join on bucket replaces the full scan; recall is traded via ``b``.

Float reproducibility contract (oracle hash-match): every element is cast
to DOUBLE before multiplication and summed strictly left-to-right
(``aggregate`` fold), matching DuckDB's ``list_reduce`` order — bit-identical
doubles on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from intelligent_ocr_spark.util import ensure_parallelism

__all__ = [
    "dot", "norm", "cosine", "cosine_topk", "sign_bucket", "ann_lsh_topk",
    "embedding_near_dups", "ivf_assign_cells", "ivf_topk",
]


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (bit-stable across engines)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast queries × full corpus scan.

    Returns (query_id, cand_id, score, rank), rank 1..k per query,
    deterministic tie-break on cand_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("score", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", _floor6("score").alias("score"), F.col("rank").cast("long").alias("rank"))
    )


def _floor6(name: str) -> Column:
    """floor-scale to 6dp: bit-stable across engines given identical doubles
    (round() half-up boundaries are not)."""
    return F.floor(F.col(name) * F.lit(1e6)) / F.lit(1e6)


def sign_bucket(vec: Column, b: int = 8) -> Column:
    """Sign-pattern LSH bucket over the first ``b`` dimensions: a string of
    '1'/'0' per dim sign (> 0). Fixed axis-aligned hyperplanes — no RNG, so
    identical across engines and runs."""
    bits = [
        F.when(F.element_at(vec, i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(b)
    ]
    return F.concat(*bits)


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance composed from bit-stable folds:
    ``(a·a + b·b) − 2·(a·b)`` — parenthesization fixed so both engines
    evaluate identically."""
    return (dot(a, a) + dot(b, b)) - F.lit(2.0) * dot(a, b)


def ivf_assign_cells(
    vectors: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding", nprobe: int = 1,
) -> DataFrame:
    """IVF cell assignment: the ``nprobe`` nearest centroids by squared-L2
    (broadcast the centroid table, window rank ≤ nprobe per vector).
    Deterministic ties on centroid id. Returns (vec_id, embedding, cell)
    — one row per probed cell, so ``nprobe=1`` (the default, used for the
    corpus side) keeps the classic single-cell partitioning while query
    sides can fan out to the k nearest cells."""
    cents = centroids.select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        ensure_parallelism(vectors)
        .select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d", _l2sq(F.col("vec"), F.col("cvec")))
    )
    w = W.partitionBy("vid").orderBy(F.col("d"), F.col("cent_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(
            F.col("vid").alias(id_col),
            F.col("vec").alias(vec_col),
            F.col("cent_id").alias("cell"),
        )
    )


def ivf_refine_centroids(
    assigned: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One deterministic Lloyd step: new centroid = per-cell element-wise
    mean of the assigned vectors, computed on FLOOR-SCALED integers —
    ``floor(sum(floor(v·10⁶)) / n) / 10⁶`` — so the result is exactly
    reproducible in any engine (a plain double mean depends on summation
    order; integer sums don't). Empty cells simply disappear (their members
    went elsewhere), matching k-means semantics.

    Shape: posexplode → groupBy(cell, pos) partial-agg → groupBy(cell)
    rebuild — two short-key shuffles over (cells × dims) rows, independent
    of corpus size after the partial aggregation.
    """
    dims = assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "v"))
    agg = dims.groupBy("cell", "pos").agg(
        F.sum(F.floor(F.col("v").cast("double") * F.lit(1e6)).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = agg.withColumn(
        "c", F.floor(F.col("s").cast("double") / F.col("n")) / F.lit(1e6)
    )
    return (
        cent.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("_pc"))
        .select(
            F.col("cell").alias(id_col),
            F.transform("_pc", lambda x: x["c"]).alias(vec_col),
        )
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, n_cells: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", refine: int = 1,
    nprobe: int = 1,
) -> DataFrame:
    """IVF ANN: the second scale path beside sign-LSH.

    Seed centroids = the first ``n_cells`` corpus vectors by id (a
    deterministic, training-free seeding), then ``refine`` Lloyd
    iterations (default 1): assign → per-cell floor-scaled mean →
    re-assign. Refined centroids track the data's actual clusters, so
    recall@k beats the seed-only index whenever the first ids are not
    spread across clusters (see ``test_ivf_refined_recall``). Each query
    scores candidates from its ``nprobe`` nearest cells (standard IVF
    multi-probe): ``nprobe=1`` loses recall for boundary-adjacent queries
    — their true neighbors sit just across the cell wall — and raising it
    buys recall for a linear candidate-cost factor (candidate set is
    ~(nprobe/n_cells)× the corpus; see ``test_ivf_multiprobe_recall``).
    Corpus rows stay single-cell, so a candidate appears at most once per
    query and no post-join dedup is needed. Cell sizes can skew with
    clustered data — AQE skew-join splits hot cells, same argument as the
    LSH buckets.
    """
    # Deterministic seed that works for ANY id domain (string ids, sparse
    # numeric ids): the first n_cells rows by id order, materialized ONCE
    # (TakeOrdered — n_cells rows, tiny by construction) and re-created as
    # a local frame, so the two downstream assignment joins broadcast it
    # instead of re-running a corpus sort each.
    seed_rows = corpus.select(id_col, vec_col).orderBy(id_col).take(n_cells)
    if not seed_rows:  # fail loudly, never silently return 0 rows
        raise ValueError("ivf_topk: corpus is empty — no centroids to seed")
    centroids = corpus.sparkSession.createDataFrame(
        seed_rows, corpus.select(id_col, vec_col).schema
    )
    c_assigned = ivf_assign_cells(corpus, centroids, id_col, vec_col)
    for _ in range(refine):
        # materialize the refined centroids (n_cells × dims — tiny) so the
        # corpus and query assignment joins broadcast a local frame instead
        # of each re-running the corpus-wide mean aggregation
        refined = ivf_refine_centroids(c_assigned, id_col, vec_col)
        centroids = corpus.sparkSession.createDataFrame(
            refined.collect(), refined.schema
        )
        c_assigned = ivf_assign_cells(corpus, centroids, id_col, vec_col)
    q_assigned = ivf_assign_cells(queries, centroids, id_col, vec_col, nprobe=nprobe)
    q = q_assigned.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "cell"
    )
    c = c_assigned.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "cell"
    )
    scored = (
        c.join(q, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("score", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", _floor6("score").alias("score"), F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dups(
    corpus: DataFrame, threshold: float = 0.95, b: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the fifth dedup tier: pairs
    with cosine ≥ ``threshold``, candidate-blocked by sign-LSH bucket
    self-join (near-identical vectors share sign patterns with high
    probability; ``b`` trades recall for cost, same scale argument as
    MinHash banding). Returns (id_a, id_b, score) with id_a < id_b.
    """
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), b).alias("bucket"),
    )
    a, bb = c.alias("a"), c.alias("b")
    scored = (
        a.join(bb, "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            cosine(F.col("a.vec"), F.col("b.vec")).alias("raw"),
        )
        .filter(F.col("raw") >= threshold)
    )
    return scored.select(
        "id_a", "id_b", (F.floor(F.col("raw") * F.lit(1e6)) / F.lit(1e6)).alias("score")
    )


def ann_lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, b: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN via sign-LSH bucket equi-join, then exact cosine within bucket.

    The bucket join is the 10^12-scale substitute for the cross join in
    :func:`cosine_topk`; with ``b`` bits the candidate set shrinks ~2^-b.
    Hot buckets (skewed sign patterns) are AQE-split; add salting on
    bucket if a deployment sees a degenerate embedding distribution.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(F.col(vec_col), b).alias("bucket"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        sign_bucket(F.col(vec_col), b).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("score", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", _floor6("score").alias("score"), F.col("rank").cast("long").alias("rank"))
    )
