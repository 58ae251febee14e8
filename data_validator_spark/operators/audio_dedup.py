"""End-to-end AUDIO dedup pipeline — the audio counterpart of
text_dedup.dedup_pipeline: exact payload tier -> content embeddings
(one fused decode) -> banded cosine candidates -> connected-component
clusters -> keeper list.

Tier order is the scale decision, mirroring the text pipeline
(text_dedup.py:341):
  1. exact md5(bytes) pass FIRST — byte-identical re-ingests collapse
     to one representative before any decode happens;
  2. ONE decode per representative produces the log-mel content
     embedding (audio/features.py) — this is the pass that catches
     the same recording re-encoded under a different codec or rate,
     which no byte hash can see;
  3. candidate pairs come from the multi-band hyperplane bucketing
     (similarity.embedding_near_dups): the band join carries only
     (id, band, bucket), hot buckets chunk-split, vectors re-joined
     only onto deduped candidates for exact cosine verification;
  4. exact + embedding edges union into one duplicate graph;
     large-star/small-star components (O(log n) rounds) pick one
     keeper per cluster.

Undecodable payloads and zero-norm embeddings (silence) pass through
as their own keepers — a dedup stage must never silently drop rows it
could not analyze.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_spark.operators.graph import dedup_clusters
from data_validator_spark.operators.similarity import embedding_near_dups


@dataclass
class AudioDedupResult:
    """`keepers` is the actionable table: every input id with its
    duplicate-component and a keep/drop flag (singletons and
    unanalyzable clips keep themselves)."""

    exact_pairs: DataFrame      # (fingerprint, keep_id, dup_id)
    embedding_pairs: DataFrame  # (id_a, id_b, cos_sim) verified
    clusters: DataFrame         # (component, member_id, is_keeper)
    keepers: DataFrame          # (id, component, is_keeper) for ALL ids
    _persisted: list = field(default_factory=list)
    # the persisted (vec_id, embedding) table over the exact-tier
    # representatives (decodable, non-silent) — exposed so
    # incremental_audio_dedup can match against persisted state
    # without a second decode pass
    embeddings: DataFrame | None = None
    # the persisted (id, _fp) byte-hash projection
    hashes: DataFrame | None = None

    def unpersist(self) -> None:
        for df in self._persisted:
            df.unpersist()


def audio_dedup_pipeline(
    clips: DataFrame,
    id_col: str = "clip_id",
    threshold: float = 0.985,
    n_mels: int = 64,
    n_planes: int = 12,
    n_bands: int = 6,
    bucket_cap: int = 4096,
    plugins: dict | None = None,
    algorithm: str = "star",
) -> AudioDedupResult:
    """Input needs (id_col, codec, bytes). threshold=0.985 is the
    measured operating point for the log-mel embedding (q123: same
    content re-encoded >= 0.995, different recordings <= 0.970)."""
    from data_validator_spark.audio.features import audio_embeddings

    ids = clips.select(F.col(id_col).alias("id")).distinct()

    # tier 1: byte-identical groups, one representative each.
    # Persist ONLY the (id, hash) projection — 48 bytes/row, never the
    # payloads — so the md5-over-every-payload scan runs exactly once;
    # unpersisted, the keep aggregate, the exact_pairs join and the
    # reps join would each re-hash the corpus.
    hashes = clips.select(
        F.col(id_col).alias("id"),
        F.md5(F.col("bytes")).alias("_fp"),
    ).persist()
    keep = hashes.groupBy("_fp").agg(F.min("id").alias("keep_id"))
    exact_pairs = (
        hashes.join(keep, "_fp")
        .filter(F.col("id") != F.col("keep_id"))
        .select(
            F.col("_fp").alias("fingerprint"),
            F.col("keep_id"),
            F.col("id").alias("dup_id"),
        )
    )
    # representatives re-acquire (codec, bytes) via a keys-only join
    # against the source — only rep payloads are read for decode
    reps = (
        hashes.join(keep, "_fp")
        .filter(F.col("id") == F.col("keep_id"))
        .select("id", "_fp")
        .join(
            clips.select(
                F.col(id_col).alias("id"), F.col("codec"), F.col("bytes")
            ),
            "id",
        )
    )

    # tier 2: one decode per representative -> content embedding;
    # persisted because the banding pass and the verification re-join
    # both consume it (decode must not run twice)
    emb = (
        audio_embeddings(
            reps.select(F.col("id").alias(id_col), "codec", "bytes"),
            n_mels=n_mels,
            plugins=plugins,
        )
        .filter(F.col("embed_error").isNull())
        .select(F.col(id_col).alias("vec_id"), "embedding")
        .filter(
            F.aggregate(
                F.transform("embedding", lambda x: x * x),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            > 0.0
        )
        .persist()
    )

    # tier 3: banded candidates + exact cosine verification
    embedding_pairs = embedding_near_dups(
        emb,
        dim=2 * n_mels,
        threshold=threshold,
        n_planes=n_planes,
        n_bands=n_bands,
        bucket_cap=bucket_cap,
    )

    # tier 4: one duplicate graph from both edge sets
    edges = exact_pairs.select(
        F.col("keep_id").alias("id_a"), F.col("dup_id").alias("id_b")
    ).unionByName(embedding_pairs.select("id_a", "id_b"))
    clusters = dedup_clusters(edges, "id_a", "id_b", algorithm=algorithm)

    keepers = (
        ids.join(
            clusters.select(
                F.col("member_id").alias("id"), "component", "is_keeper"
            ),
            "id",
            "left",
        )
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("component"),
            F.coalesce(F.col("is_keeper"), F.lit(True)).alias("is_keeper"),
        )
    )
    return AudioDedupResult(
        exact_pairs=exact_pairs,
        embedding_pairs=embedding_pairs,
        clusters=clusters,
        keepers=keepers,
        _persisted=[hashes, emb],
        embeddings=emb,
        hashes=hashes,
    )


# ---------------------------------------------------------------- incremental


@dataclass
class IncrementalAudioDedupResult:
    """`assignments`: every batch clip id with its final keeper and
    resolution path — 'exact_state' (byte-identical to a persisted
    clip), 'near_state' (its component keeper's content embedding
    matched a persisted keeper at cosine >= threshold), 'batch_dup',
    or 'new'."""

    assignments: DataFrame  # (id, keep_id, via)
    within: AudioDedupResult

    def unpersist(self) -> None:
        self.within.unpersist()


def incremental_audio_dedup(
    clips: DataFrame,
    store,
    id_col: str = "clip_id",
    threshold: float = 0.985,
    n_mels: int = 64,
    n_planes: int = 12,
    n_bands: int = 6,
    bucket_cap: int = 4096,
    plugins: dict | None = None,
    algorithm: str = "star",
    update_state: bool = True,
) -> IncrementalAudioDedupResult:
    """Audio content dedup of ONE NEW BATCH against the persisted
    corpus state (plans.snapshots.DedupStateStore) — prior batches'
    payloads are never re-read OR re-decoded; the state carries only
    (fp, keep_id) byte hashes and fixed-size log-mel embeddings + band
    buckets per keeper.

    Unlike the text path (where cross-batch verification falls back to
    the minhash ESTIMATE), audio cross-batch matches are verified
    EXACTLY: the stored artifact IS the content embedding, so the
    batch keeper's vector takes exact cosine against the persisted
    vector — identical semantics to the within-batch tier. The
    hyperplane family is deterministic in (dim, n_planes), so buckets
    computed this batch join buckets stored last month.

    State reads are pinned (read_pinned) so the batch never matches
    its own appended rows. Per-keeper state is fixed-size: the widest
    cross-batch operation is the (band, bucket) join.
    """
    from data_validator_spark.operators.similarity import _banded, cosine

    spark = clips.sparkSession
    store.check_meta(
        spark,
        "audio",
        {"n_mels": n_mels, "n_planes": n_planes, "n_bands": n_bands},
    )
    within = audio_dedup_pipeline(
        clips, id_col, threshold, n_mels, n_planes, n_bands,
        bucket_cap, plugins, algorithm,
    )
    base = within.keepers.select("id", F.col("component").alias("_bk"))
    fp = within.hashes  # (id, _fp) — persisted, payloads hashed once

    has_fp = store.exists(spark, "audio_fp")
    if has_fp:
        st_fp = store.read_pinned(spark, "audio_fp").select(
            F.col("fp").alias("_fp"), F.col("keep_id").alias("_st_exact")
        )
        ex = fp.join(st_fp, "_fp", "left").select("id", "_st_exact")
    else:
        ex = fp.select(
            "id", F.lit(None).cast(fp.schema["id"].dataType).alias("_st_exact")
        )

    near = None
    if store.exists(spark, "audio_bands"):
        dim = 2 * n_mels
        keeper_ids = base.select(F.col("_bk").alias("vec_id")).dropDuplicates(
            ["vec_id"]
        )
        emb_k = within.embeddings.join(keeper_ids, "vec_id", "left_semi")
        banded_k = _banded(
            emb_k.select(F.col("vec_id").alias("_id"), F.col("embedding")),
            "_id", "embedding", dim, n_planes, n_bands,
        ).select("_id", "band", "bucket")
        st_bands = store.read_pinned(spark, "audio_bands").select(
            F.col("id").alias("_old"), "band", "bucket"
        )
        cand = (
            banded_k.join(st_bands, ["band", "bucket"])
            .select("_id", "_old")
            .dropDuplicates(["_id", "_old"])
        )
        st_emb = store.read_pinned(spark, "audio_emb").select(
            F.col("id").alias("_old"), F.col("embedding").alias("_v_old")
        )
        scored = (
            cand.join(
                emb_k.select(F.col("vec_id").alias("_id"), "embedding"), "_id"
            )
            .join(st_emb, "_old")
            .withColumn("_cos", cosine(F.col("embedding"), F.col("_v_old")))
            .filter(F.col("_cos") >= threshold)
        )
        from pyspark.sql import Window

        near = (
            scored.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("_id").orderBy(
                        F.col("_cos").desc(), F.col("_old").asc()
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(F.col("_id").alias("_bk"), F.col("_old").alias("_st_near"))
        )

    k_res = ex.withColumnRenamed("id", "_bk").withColumnRenamed(
        "_st_exact", "_k_exact"
    )
    res = base.join(ex, "id", "left").join(k_res, "_bk", "left")
    if near is not None:
        res = res.join(near, "_bk", "left")
    else:
        res = res.withColumn(
            "_st_near", F.lit(None).cast(fp.schema["id"].dataType)
        )
    assignments = res.select(
        "id",
        F.coalesce("_st_exact", "_k_exact", "_st_near", "_bk").alias("keep_id"),
        F.when(F.col("_st_exact").isNotNull(), F.lit("exact_state"))
        .when(F.col("_k_exact").isNotNull(), F.lit("exact_state"))
        .when(F.col("_st_near").isNotNull(), F.lit("near_state"))
        .when(F.col("_bk") != F.col("id"), F.lit("batch_dup"))
        .otherwise(F.lit("new"))
        .alias("via"),
    ).persist()
    within._persisted.append(assignments)

    if update_state:
        fp_map = (
            fp.join(assignments, "id")
            .select(F.col("_fp").alias("fp"), "keep_id")
            .filter(F.col("fp").isNotNull())
            .dropDuplicates(["fp"])
        )
        if has_fp:
            fp_map = fp_map.join(
                store.read_pinned(spark, "audio_fp").select("fp"),
                "fp",
                "left_anti",
            )
        store.append(fp_map, "audio_fp")
        new_ids = assignments.filter(
            (F.col("via") == "new") & (F.col("keep_id") == F.col("id"))
        ).select(F.col("id").alias("vec_id"))
        emb_new = within.embeddings.join(new_ids, "vec_id", "left_semi")
        store.append(
            emb_new.select(F.col("vec_id").alias("id"), "embedding"),
            "audio_emb",
        )
        store.append(
            _banded(
                emb_new.select(F.col("vec_id").alias("_id"), "embedding"),
                "_id", "embedding", 2 * n_mels, n_planes, n_bands,
            ).select(F.col("_id").alias("id"), "band", "bucket"),
            "audio_bands",
        )

    return IncrementalAudioDedupResult(assignments=assignments, within=within)
