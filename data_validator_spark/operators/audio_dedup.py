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
    )
