"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force cosine top-k  — the exactness baseline: broadcast the
    (small) query set, JVM-side dot products via F.zip_with/aggregate,
    window top-k. One pass over the corpus, no O(n^2) shuffle.
  LSH-bucketed ANN          — the scale path: random-hyperplane
    signatures from deterministic xxhash64 streams bucket the corpus;
    only same-bucket pairs are scored. Bucket count trades recall for
    cost; probing multiple bands restores recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is expected to be small (it is broadcast); the corpus is
    scanned once. Rank on (rounded cosine desc, neighbor id asc) so
    ordering is reproducible across engines/float orders.

    -> (query_id, neighbor_id, cos_sim, rank)
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim", F.round(cosine(F.col("_cv"), F.col("_qv")), round_digits)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign pattern of dot products against pseudo-random hyperplanes.

    Plane p component j = (xxhash64(p*dim+j) / 2^63) in [-1, 1) —
    deterministic across executors, no stored plane matrix. Packed into
    a long bitmask.

    Built as array folds (transform/zip_with/aggregate) rather than an
    unrolled dim x n_planes expression tree: the unrolled form (512+
    nodes) blew past codegen limits and evaluated interpreted.
    """

    def plane_dot(p: Column) -> Column:
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.xxhash64((p * dim + j).cast("int")) / F.lit(float(2**63))),
        )
        return F.aggregate(
            F.zip_with(vec, comps, lambda x, y: x.cast("double") * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(
            plane_dot(p) > 0, F.pow(F.lit(2.0), p).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc.bitwiseOR(b)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 0,
    k: int = 5,
    n_planes: int = 12,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    hyperplane bucket. dim must be the embedding length (static).

    -> (query_id, neighbor_id, cos_sim, rank) — a recall-controlled
    subset of brute_force_topk's answer.
    """
    if dim <= 0:
        raise ValueError("dim (embedding length) is required")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("_cv"), F.col("_qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 0,
    threshold: float = 0.95,
    n_planes: int = 10,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join:
    (id_a, id_b, cos_sim >= threshold), id_a < id_b."""
    if dim <= 0:
        raise ValueError("dim (embedding length) is required")
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_signature(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    a = sig.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), "_bucket")
    b = sig.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "_bucket")
    pairs = (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
    )
    return pairs.select("id_a", "id_b", "cos_sim").dropDuplicates(["id_a", "id_b"])
