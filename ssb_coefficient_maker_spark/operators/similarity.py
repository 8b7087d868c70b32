"""Similarity search over embedding vectors (SURVEY.md §2 Part C EXT).

Two tiers:

- brute-force cosine top-k — the exact baseline: one scan, per-row
  dot product via ``F.aggregate``/``F.zip_with`` (JVM lambda
  functions, no Python), then TakeOrderedAndProject. Linear in rows;
  at 100 TB this is the verifier, not the server.
- IVF-style bucketed search — deterministic coarse quantizer
  (centroid per residue class stands in for k-means here), each
  vector assigned to its nearest centroid once (broadcast of the tiny
  centroid table), then queries probe only their bucket: the scan
  shrinks by ~n_centroids×. The bucket assignment is the thing you'd
  persist + bucket-by at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ssb_coefficient_maker_spark.functions.vectors import cosine, l2_norm
from ssb_coefficient_maker_spark.sources.loaders import load_table


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> Column:
    """Collect one query vector driver-side and inline it as an array
    literal — broadcast-by-literal, no join at all."""
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").head()
    if row is None:
        raise ValueError(f"no embedding with vec_id={vec_id}")
    return F.array(*[F.lit(float(x)) for x in row[0]])


def q34_cosine_topk(spark: SparkSession, sf_dir: str, k: int = 10, query_id: int = 0) -> DataFrame:
    """Exact top-k by cosine against the vec_id=0 query vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir, query_id)
    return (
        emb.filter(F.col("vec_id") != query_id)
        .select("vec_id", "label", F.round(cosine(F.col("embedding"), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def assign_buckets(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse step).

    centroids: (centroid_id, cvec) — tiny, broadcast. The argmin is a
    max_by over the exploded (vector × centroid) pairs; the explode
    factor equals n_centroids, bounded and shuffle-free.
    """
    joined = emb.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        "vec_id",
        "label",
        "embedding",
        "centroid_id",
        cosine(F.col("embedding"), F.col("cvec")).alias("cscore"),
    )
    return scored.groupBy("vec_id").agg(
        F.max_by("centroid_id", "cscore").alias("bucket"),
        F.first("label").alias("label"),
        F.first("embedding").alias("embedding"),
    )


def q35_ivf_topk(spark: SparkSession, sf_dir: str, k: int = 10, query_id: int = 0) -> DataFrame:
    """Bucketed ANN: probe only the query's bucket (rows-only check —
    recall vs exact is data-dependent by construction)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select((F.col("vec_id") / 50).cast("int").alias("centroid_id"), F.col("embedding").alias("cvec"))
    )
    bucketed = assign_buckets(emb, centroids)
    q = _query_vector(spark, sf_dir, query_id)
    qbucket = (
        bucketed.filter(F.col("vec_id") == query_id).select("bucket").head()[0]
    )
    return (
        bucketed.filter((F.col("bucket") == qbucket) & (F.col("vec_id") != query_id))
        .select("vec_id", "label", F.round(cosine(F.col("embedding"), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def q36_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats: count + mean L2 norm (sanity surface
    for the vector column)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", l2_norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("nrm"), 4).alias("avg_norm"))
        .orderBy("label")
    )


def q50_embedding_neardup(spark: SparkSession, sf_dir: str, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup tier for modalities
    where text hashing can't see the duplication).

    All-pairs dense linear algebra is the one place the JVM lambda path
    loses: a 64-element ``zip_with`` dot evaluated per candidate pair is
    interpreted per element (measured ~50 s for 2M pairs at sf0.1).
    Instead: collect the (small) embedding matrix driver-side, ship it
    into an Arrow-batched ``mapInPandas``, and compute each partition's
    row-block against the full matrix with vectorized numpy (~1 s).
    Accumulation loops over dimensions in order, matching DuckDB's
    sequential ``list_sum`` bit-for-bit. At 100 TB the full matrix no
    longer fits — swap the block source for LSH buckets
    (``cosine_neardup_bucketed``); the per-block math is identical.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    n, d = mat.shape
    # sequential per-dimension accumulation == duckdb list_sum order
    norms = np.zeros(n)
    for k in range(d):
        norms += mat[:, k] * mat[:, k]
    norms = np.sqrt(norms)

    def block(batches):
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            bids = pdf["vec_id"].to_numpy()
            bemb = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
            bnorm = np.zeros(len(bids))
            for k in range(d):
                bnorm += bemb[:, k] * bemb[:, k]
            bnorm = np.sqrt(bnorm)
            dots = np.zeros((len(bids), n))
            for k in range(d):
                dots += np.outer(bemb[:, k], mat[:, k])
            cos = np.round(dots / np.outer(bnorm, norms), 4)
            for i in range(len(bids)):
                mask = (ids > bids[i]) & (cos[i] >= threshold)
                js = np.nonzero(mask)[0]
                out_a.extend([bids[i]] * len(js))
                out_b.extend(ids[js])
                out_c.extend(cos[i][js])
            yield pd.DataFrame(
                {"vec_a": pd.Series(out_a, dtype="int64"),
                 "vec_b": pd.Series(out_b, dtype="int64"),
                 "cos_sim": pd.Series(out_c, dtype="float64")}
            )

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(block, schema="vec_a long, vec_b long, cos_sim double")
        .orderBy("vec_a", "vec_b")
    )


def hyperplane_buckets(emb: DataFrame, n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Random-hyperplane LSH for cosine: bucket = sign bits of R
    projections. Vectors with high cosine land in the same bucket with
    probability (1 - theta/pi)^R. Planes are generated deterministically
    driver-side and inlined as literals — no join, no shuffle; the
    bucket id is the thing to partition/bucket storage by at scale.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    dim_row = emb.select(F.size("embedding").alias("d")).head()
    planes = rng.normal(size=(n_planes, dim_row["d"]))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        proj = F.aggregate(
            F.zip_with(F.col("embedding"), lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return emb.withColumn("bucket", bucket)


def cosine_neardup_bucketed(
    emb: DataFrame, threshold: float = 0.4, n_planes: int = 8
) -> DataFrame:
    """Scale path for q50: candidate pairs only within an LSH bucket
    (shuffle on bucket id, each bucket ~n/2^R rows), then the exact
    cosine verification — same scoring expression as the brute force.
    Recall is tunable via n_planes / multi-probe; this single-probe
    variant trades recall for a 2^R candidate reduction.
    """
    b = hyperplane_buckets(emb, n_planes=n_planes)
    normed = b.select(
        "vec_id", "bucket", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    from ssb_coefficient_maker_spark.functions.vectors import dot

    lhs = normed.alias("a")
    rhs = normed.alias("b")
    cos = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    return (
        lhs.join(
            rhs,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans_fit(emb: DataFrame, k: int = 10, iters: int = 3) -> DataFrame:
    """Distributed Lloyd iterations for an IVF coarse quantizer.

    Iterative-algorithm shape on Spark: the BIG side (vectors) never
    leaves the cluster; only the k centroids (k×dim doubles) cross the
    driver boundary per iteration. Each iteration = one broadcast
    cross-score + argmax (assign_buckets) and one posexplode + groupBy
    average for the new means. Deterministic init (lowest vec_ids) —
    reproducible runs, no RNG state.

    Returns the final assignment: (vec_id, bucket, label, embedding).
    """
    centroids = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("centroid_id"),
            F.col("embedding").alias("cvec"),
        )
    )
    assigned = None
    for _ in range(iters):
        assigned = assign_buckets(emb, centroids)
        means = (
            assigned.select("bucket", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("bucket", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("bucket")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        centroids = means.select(F.col("bucket").alias("centroid_id"), "cvec")
    return assigned


def q56_kmeans_ivf(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Trained-IVF summary: cluster sizes and cohesion after 3 Lloyd
    iterations (rows-only: iterative + data-dependent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_fit(emb, k=k, iters=3)
    return (
        assigned.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("bucket")
    )
