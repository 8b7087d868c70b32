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

from pyspark.sql import Column, DataFrame, SparkSession
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

    Brute-force all-pairs here (oracle-checkable); norms are computed
    once per vector BEFORE the self-join, so the pair loop is one
    zip_with dot product. The scale path replaces the self-join with
    bucketed candidates from ``assign_buckets`` (probe same-bucket
    pairs only) — identical scoring expression.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    a = normed.alias("a")
    b = normed.alias("b")
    from ssb_coefficient_maker_spark.functions.vectors import dot

    cos = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
