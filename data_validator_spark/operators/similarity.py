"""Similarity search over embedding columns (array<float>).

Two paths:
  brute-force cosine top-k  — the exactness baseline: broadcast the
    (small) query set, JVM-side dot products via F.zip_with/aggregate,
    window top-k. One pass over the corpus, no O(n^2) shuffle.
  LSH-bucketed ANN          — the scale path: MULTI-BAND random-
    hyperplane signatures bucket the corpus; only pairs sharing a
    bucket in at least one band are scored. n_planes controls bucket
    selectivity, n_bands restores recall (union of band candidates),
    exactly like minhash LSH banding in operators/text_dedup.

The hyperplane matrices are materialized ONCE as constant-folded
literal array<array<double>> columns (numpy RandomState(seed), so
deterministic across executors and runs). The earlier form derived
each plane component from xxhash64(p*dim+j) per row — re-evaluating
dim x n_planes hash expressions for every row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module scope: pandas_udf type hints resolve here
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
    """NULL (not a crash) for zero-norm vectors: under Spark 4's
    default ANSI mode a plain division throws DIVIDE_BY_ZERO, and
    zero vectors are a legal embedding outcome (digital silence /
    sub-frame clips in audio/features.py)."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


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


def _planes_literal(dim: int, n_planes: int, seed: int) -> Column:
    """n_planes x dim standard-normal hyperplanes as a literal
    array<array<double>> — constant-folded by Catalyst into a single
    Literal, so it is NOT re-evaluated per row (numpy MT19937 stream:
    deterministic across platforms/executors/runs)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in planes]
    )


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 0
) -> Column:
    """Sign pattern of dot products against n_planes fixed random
    hyperplanes, packed into a long bitmask. Array folds only
    (transform/zip_with/aggregate) so the expression stays inside
    whole-stage codegen; the plane matrix is a folded constant.

    Kept deliberately as the documented PARITY REFERENCE for the Arrow
    matmul path (_band_buckets_udf, which is what the operators use):
    tests assert both forms bucket identically, which pins the matmul
    implementation to a pure-Column spec."""
    if n_planes > 62:
        raise ValueError("n_planes must be <= 62 to pack into a long")
    planes = _planes_literal(dim, n_planes, seed)
    powers = F.array(*[F.lit(1 << p).cast("long") for p in range(n_planes)])
    dots = F.transform(
        planes,
        lambda plane: F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            dots,
            powers,
            lambda d, pw: F.when(d > 0, pw).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b),
    )


def _band_buckets_udf(dim: int, n_planes: int, n_bands: int):
    """Arrow-batched bucket computation: ALL n_bands signatures in one
    numpy matmul per batch ((rows x dim) @ (dim x n_bands*n_planes) ->
    sign bits -> packed longs per band). Returns array<long> of length
    n_bands per row.

    The per-row Column-fold form (hyperplane_signature) evaluates
    ~n_bands*n_planes*dim scalar expression nodes per row — measured
    ~17M element-ops/s interpreted, i.e. seconds per 100k vectors.
    The matmul form moves the same math into BLAS at negligible Arrow
    transfer cost (vectors are small), and stays a map-only stage.
    Plane matrices are identical to _planes_literal (same RandomState
    stream per band seed), so both forms bucket identically up to
    float-summation order."""
    from pyspark.sql.functions import pandas_udf

    if n_planes > 62:
        # same guard as hyperplane_signature (the Column-form parity
        # reference): 1 << 63 overflows int64 and would silently wrap
        # into wrong buckets instead of erroring.
        raise ValueError("n_planes must be <= 62 to pack into a long")
    mats = [
        np.random.RandomState(b).standard_normal((n_planes, dim))
        for b in range(n_bands)
    ]
    planes = np.concatenate(mats, axis=0).T  # (dim, n_bands*n_planes)
    powers = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def _buckets(vs: pd.Series) -> pd.Series:
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vs], dtype=np.float64
        )
        if mat.size == 0:
            return pd.Series([], dtype=object)
        bits = (mat @ planes) > 0  # (rows, n_bands*n_planes)
        by_band = bits.reshape(len(mat), n_bands, n_planes)
        packed = (by_band * powers).sum(axis=2).astype(np.int64)
        return pd.Series(list(packed))

    return _buckets


def _banded(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int, n_bands: int
) -> DataFrame:
    """(id, band, bucket) rows: one per (vector, band) — the multi-
    probe banding used by lsh_topk / embedding_near_dups. Extra
    columns of df are preserved (e.g. the vector itself for in-join
    scoring on the broadcast side)."""
    df = df.filter(F.col(vec_col).isNotNull())  # null vectors have no bucket
    buckets = _band_buckets_udf(dim, n_planes, n_bands)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"), F.element_at("_bk", b + 1).alias("bucket")
            )
            for b in range(n_bands)
        ]
    )
    return (
        df.withColumn("_bk", buckets(F.col(vec_col)))
        .select(*df.columns, F.explode(bands).alias("bb"))
        .select(*df.columns, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 0,
    k: int = 5,
    n_planes: int = 12,
    n_bands: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the
    query's hyperplane bucket in AT LEAST ONE of n_bands independent
    bands. dim must be the embedding length (static).

    Plan shape: the query side (small) is banded and broadcast, so the
    band join is a map-side BroadcastHashJoin — the corpus is scanned
    once and never shuffled by the join. Scoring happens before the
    pair dedup, so the dedup shuffle carries only
    (query_id, neighbor_id, cos_sim).

    -> (query_id, neighbor_id, cos_sim, rank) — recall grows with
    n_bands (union of band candidates); see tests for measured recall
    vs brute_force_topk.
    """
    if dim <= 0:
        raise ValueError("dim (embedding length) is required")
    c = _banded(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        ),
        "neighbor_id", "_cv", dim, n_planes, n_bands,
    )
    q = _banded(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        ),
        "query_id", "_qv", dim, n_planes, n_bands,
    )
    scored = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim", F.round(cosine(F.col("_cv"), F.col("_qv")), round_digits)
        )
        .select("query_id", "neighbor_id", "cos_sim")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 0,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    round_digits: int = 6,
    max_train_rows: int = 1_000_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse
    quantizer partitions the corpus into n_cells inverted lists; each
    query scores only the lists of its nprobe nearest centroids.

    The alternative scale path to hyperplane LSH (lsh_topk): IVF adapts
    cell boundaries to the data distribution, so recall at a given
    candidate volume is usually higher on clustered corpora; LSH needs
    no training pass. Both are provided (the driver brief's
    "IVF or LSH" — this engine ships both).

    Plan shape: KMeans training is the one iterative stage (seeded,
    deterministic for a fixed input+partitioning) and its input is
    CAPPED at max_train_rows via a deterministic hash sample + hard
    limit — at 10^12 rows an uncapped fit costs 20 iterations x
    full-table passes before the first query is answered, while
    centroid quality at n_cells <= a few hundred is statistically
    indistinguishable on a ~1M-row sample. Afterwards the centroid
    matrix is a tiny broadcast constant — corpus cell assignment is a
    map-only Arrow matmul (argmin distance), queries (small,
    broadcast) explode to their nprobe probe cells, and the cell join
    is a BroadcastHashJoin: the corpus is never shuffled.

    -> (query_id, neighbor_id, cos_sim, rank)
    """
    if dim <= 0:
        raise ValueError("dim (embedding length) is required")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    from data_validator_spark.operators.sampling import hash_sample

    n_corpus = corpus.count()  # columnar count: cheap vs 20 fit passes
    train_src = corpus
    if n_corpus > max_train_rows:
        # ~10% over-draw (hash_sample hits the fraction only in
        # expectation), then a hard limit so the fit input is bounded
        # regardless of corpus size. Deterministic: md5 buckets + limit
        # over the sample — no rand().
        frac = min(1.0, 1.1 * max_train_rows / n_corpus)
        train_src = hash_sample(corpus, [id_col], frac).limit(max_train_rows)
    train = train_src.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    centers = np.asarray([np.asarray(c) for c in model.clusterCenters()])
    c_sq = (centers**2).sum(axis=1)  # ||c||^2 per centroid

    def _cells_udf(n_take: int):
        @pandas_udf("array<int>")
        def _cells(vs: pd.Series) -> pd.Series:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vs], dtype=np.float64
            )
            if mat.size == 0:
                return pd.Series([], dtype=object)
            # argmin ||x-c||^2 = argmin ||c||^2 - 2 x.c  (||x||^2 const per row)
            d = c_sq[None, :] - 2.0 * (mat @ centers.T)
            order = np.argsort(d, axis=1, kind="stable")[:, :n_take]
            return pd.Series([row.astype(np.int32) for row in order])

        return _cells

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.element_at(_cells_udf(1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(_cells_udf(nprobe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim", F.round(cosine(F.col("_cv"), F.col("_qv")), round_digits)
        )
        .select("query_id", "neighbor_id", "cos_sim")
        .dropDuplicates(["query_id", "neighbor_id"])
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
    n_bands: int = 4,
    bucket_cap: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-band bucketed
    self-join: (id_a, id_b, cos_sim >= threshold), id_a < id_b.

    Shuffle discipline mirrors minhash_lsh_candidates: the band join
    carries only (id, band, bucket) — never the vectors — with hot
    buckets chunk-split by skew.salted_self_join; vectors are
    re-joined onto the deduped candidate pairs for exact cosine
    verification.
    """
    if dim <= 0:
        raise ValueError("dim (embedding length) is required")
    from data_validator_spark.operators.skew import salted_self_join

    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    banded = _banded(
        vecs.select("_id", "_v"), "_id", "_v", dim, n_planes, n_bands
    ).select("_id", "band", "bucket")
    pairs = (
        salted_self_join(banded, "_id", ["band", "bucket"], cap=bucket_cap)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    vb = vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _pq_train(mat: np.ndarray, n_sub: int, n_pq: int, seed: int) -> np.ndarray:
    """Driver-side product-quantizer training: per-subspace Lloyd
    k-means (vectorized numpy, seeded deterministic init) on the
    capped sample. -> codebooks (n_sub, n_pq, sub_dim)."""
    n, dim = mat.shape
    sd = dim // n_sub
    rng = np.random.default_rng(seed)
    books = np.empty((n_sub, n_pq, sd))
    for j in range(n_sub):
        x = mat[:, j * sd : (j + 1) * sd]
        # k-means++-lite: distinct seeded picks
        idx = rng.choice(n, size=min(n_pq, n), replace=False)
        c = x[idx].copy()
        if len(c) < n_pq:  # degenerate tiny sample
            c = np.concatenate([c, np.zeros((n_pq - len(c), sd))])
        for _ in range(15):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for ci in range(n_pq):
                m = assign == ci
                if m.any():
                    c[ci] = x[m].mean(axis=0)
        books[j] = c
    return books


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 0,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    n_sub: int = 8,
    n_pq: int = 32,
    refine_mult: int = 8,
    seed: int = 7,
    round_digits: int = 6,
    max_train_rows: int = 1_000_000,
    pq_train_rows: int = 100_000,
) -> DataFrame:
    """IVF-PQ approximate top-k: the IVF coarse quantizer plus a
    product quantizer that compresses every corpus vector to n_sub
    bytes-ish codes (dim x float32 -> n_sub small ints — at dim=64 /
    n_sub=8 that is a 32x memory cut on the inverted lists), scored by
    asymmetric distance (ADC: per-query dot-product lookup tables
    against the codebooks), then the top refine_mult*k ADC candidates
    re-ranked EXACTLY by joining their true vectors back (a broadcast
    equi-join on the small candidate id set).

    The 100-TB story: inverted lists carry (id, cell, code) only —
    the full-precision embedding column is touched by exactly two
    scans (encode; refine join), never shuffled wholesale, and the
    in-flight candidate set per query is bounded by
    nprobe * cell_size for ADC and refine_mult*k for exact re-rank.

    Training: coarse KMeans on the capped hash-sample (as ivf_topk);
    PQ codebooks driver-side on a further-capped sample
    (pq_train_rows x dim floats — ~50 MB at the defaults).

    -> (query_id, neighbor_id, cos_sim, rank) — cos_sim is EXACT for
    returned rows (refine stage), so planted-twin oracles hold.
    """
    if dim <= 0:
        raise ValueError("dim (embedding length) is required")
    if dim % n_sub:
        raise ValueError("n_sub must divide dim")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    from data_validator_spark.operators.sampling import hash_sample

    n_corpus = corpus.count()
    train_src = corpus
    if n_corpus > max_train_rows:
        frac = min(1.0, 1.1 * max_train_rows / n_corpus)
        train_src = hash_sample(corpus, [id_col], frac).limit(max_train_rows)
    train = train_src.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    centers = np.asarray([np.asarray(c) for c in model.clusterCenters()])
    c_sq = (centers**2).sum(axis=1)

    pq_src = train_src if n_corpus <= pq_train_rows else hash_sample(
        corpus, [id_col], min(1.0, 1.1 * pq_train_rows / n_corpus)
    ).limit(pq_train_rows)
    sample = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in
         pq_src.select(vec_col).toPandas()[vec_col]]
    )
    books = _pq_train(sample, n_sub, n_pq, seed)  # (n_sub, n_pq, sd)
    book_sq = (books**2).sum(axis=2)  # (n_sub, n_pq)
    sd = dim // n_sub

    @pandas_udf("struct<cell:int, code:array<int>>")
    def _encode(vs: pd.Series) -> pd.DataFrame:
        mat = np.asarray([np.asarray(v, np.float64) for v in vs])
        if mat.size == 0:
            return pd.DataFrame({"cell": [], "code": []})
        cell = (c_sq[None, :] - 2.0 * (mat @ centers.T)).argmin(axis=1)
        codes = np.empty((len(mat), n_sub), np.int32)
        for j in range(n_sub):
            x = mat[:, j * sd : (j + 1) * sd]
            d = book_sq[j][None, :] - 2.0 * (x @ books[j].T)
            codes[:, j] = d.argmin(axis=1)
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "code": list(codes)}
        )

    @pandas_udf("array<int>")
    def _probe(vs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, np.float64) for v in vs])
        if mat.size == 0:
            return pd.Series([], dtype=object)
        d = c_sq[None, :] - 2.0 * (mat @ centers.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32) for row in order])

    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"), _encode(F.col(vec_col)).alias("_e")
    ).select(
        "neighbor_id", F.col("_e.cell").alias("cell"), F.col("_e.code").alias("code")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(_probe(F.col(vec_col))).alias("cell"),
    )

    @pandas_udf("double")
    def _adc(qvs: pd.Series, codes: pd.Series) -> pd.Series:
        if len(qvs) == 0:
            return pd.Series([], dtype=float)
        out = np.empty(len(qvs))
        code_mat = np.asarray([np.asarray(c, np.int64) for c in codes])
        qmat = np.asarray([np.asarray(v, np.float64) for v in qvs])
        # batch rows share few distinct queries; vectorize per query
        # via lookup tables dot[j, c] = q_j . C[j, c]
        keys, inv = np.unique(qmat, axis=0, return_inverse=True)
        for qi in range(len(keys)):
            rows = np.nonzero(inv == qi)[0]
            qv = keys[qi]
            dot = np.einsum(
                "jd,jkd->jk", qv.reshape(n_sub, sd), books
            )  # (n_sub, n_pq)
            est_dot = dot[np.arange(n_sub)[None, :], code_mat[rows]].sum(axis=1)
            est_nsq = book_sq[np.arange(n_sub)[None, :], code_mat[rows]].sum(
                axis=1
            )
            qn = np.sqrt((qv**2).sum())
            denom = np.sqrt(np.maximum(est_nsq, 1e-30)) * max(qn, 1e-30)
            out[rows] = est_dot / denom
        return pd.Series(out)

    cand = (
        enc.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("est_cos", _adc(F.col("_qv"), F.col("code")))
        .select("query_id", "neighbor_id", "est_cos")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("est_cos").desc(), F.col("neighbor_id").asc()
    )
    short = cand.withColumn("_r", F.row_number().over(w_adc)).filter(
        F.col("_r") <= refine_mult * k
    )

    # exact refine: broadcast the SMALL candidate set against the
    # corpus scan — full vectors touched only for survivors
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv2"))
    refined = (
        cv.join(F.broadcast(short.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "cos_sim", F.round(cosine(F.col("_cv"), F.col("_qv2")), round_digits)
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_audit(
    df: DataFrame, vec_col: str, expected_dim: int
) -> DataFrame:
    """Embedding-column validation: ONE summary row with
    (n_rows, n_null, n_wrong_dim, n_nonfinite, n_zero, n_valid,
    avg_norm, min_norm, max_norm).

    The schema tier for an `array<float>` column — the checks every
    ANN/similarity operator in this module silently assumes: vectors
    present, the right width, finite (one NaN poisons a dot product),
    and non-zero (cosine is undefined at the origin). Norm statistics
    run over VALID rows only and catch the 'unnormalized batch'
    defect (a corpus mixing unit and raw embeddings bimodalizes
    max/min norm long before recall collapses). Pure Column algebra
    over one aggregate — the norm fold is a sequential array
    aggregate, so an external oracle replays it bit-for-bit.
    """
    v = F.col(vec_col)
    is_null = v.isNull()
    wrong_dim = ~is_null & (F.size(v) != expected_dim)
    finite_shape = ~is_null & ~wrong_dim
    nonfinite = finite_shape & F.exists(
        v,
        lambda x: F.isnan(x) | (F.abs(x.cast("double")) == F.lit(float("inf"))),
    )
    norm2 = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    zero = finite_shape & ~nonfinite & (norm2 == 0.0)
    valid = finite_shape & ~nonfinite & ~zero
    norm = F.when(valid, F.sqrt(norm2))
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(is_null.cast("long")).cast("long").alias("n_null"),
        F.sum(wrong_dim.cast("long")).cast("long").alias("n_wrong_dim"),
        F.sum(nonfinite.cast("long")).cast("long").alias("n_nonfinite"),
        F.sum(zero.cast("long")).cast("long").alias("n_zero"),
        F.sum(valid.cast("long")).cast("long").alias("n_valid"),
        F.round(F.avg(norm), 6).alias("avg_norm"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


def centroid_drift(
    base: DataFrame,
    cur: DataFrame,
    group_col: str,
    vec_col: str,
    expected_dim: int,
) -> DataFrame:
    """Per-group embedding-distribution drift between two snapshots:
    -> (group, n_base, n_cur, centroid_cos, norm_ratio).

    The embedding-space analogue of the scalar drift tests: an
    encoder upgrade, a preprocessing change, or a poisoned batch
    moves a label's centroid long before scalar columns notice.
    centroid_cos is the cosine between the two per-group mean
    vectors (1.0 = unchanged direction); norm_ratio is
    |c_cur| / |c_base| (embedding-scale change, e.g. normalization
    dropped). Groups present on only one side report NULL metrics.

    Execution: vectors explode to (group, dim_index, value) and
    reduce by a single hash aggregate — the centroid table is
    groups x dim rows, tiny — then the two centroid tables join on
    the group. No vector ever shuffles whole; wrong-width vectors
    are excluded up front (embedding_audit is the gate that counts
    them).
    """

    def centroids(df: DataFrame) -> DataFrame:
        ok = df.filter(
            F.col(vec_col).isNotNull() & (F.size(vec_col) == expected_dim)
        )
        return (
            ok.select(
                F.col(group_col).alias("_g"),
                F.posexplode(F.col(vec_col)).alias("_i", "_x"),
            )
            .groupBy("_g", "_i")
            .agg(
                F.sum(F.col("_x").cast("double")).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .groupBy("_g")
            .agg(
                F.max("_n").cast("long").alias("n"),
                F.array_sort(
                    F.collect_list(F.struct("_i", (F.col("_s") / F.col("_n")).alias("_m")))
                ).alias("_c"),
            )
            .select(
                "_g",
                "n",
                F.transform(F.col("_c"), lambda s: s.getField("_m")).alias("c"),
            )
        )

    b = centroids(base).select(
        F.col("_g"), F.col("n").alias("n_base"), F.col("c").alias("cb")
    )
    c = centroids(cur).select(
        F.col("_g"), F.col("n").alias("n_cur"), F.col("c").alias("cc")
    )
    j = b.join(c, "_g", "full_outer")
    dot = F.aggregate(
        F.zip_with(F.col("cb"), F.col("cc"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    both = F.col("cb").isNotNull() & F.col("cc").isNotNull()
    nb, nc = norm(F.col("cb")), norm(F.col("cc"))
    return j.select(
        F.col("_g").alias(group_col),
        F.coalesce(F.col("n_base"), F.lit(0)).cast("long").alias("n_base"),
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
        F.when(both & (nb > 0) & (nc > 0), F.round(dot / (nb * nc), 6)).alias(
            "centroid_cos"
        ),
        F.when(both & (nb > 0), F.round(nc / nb, 6)).alias("norm_ratio"),
    )
