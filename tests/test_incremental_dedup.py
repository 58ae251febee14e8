"""Incremental content dedup against persisted corpus state
(plans.snapshots.DedupStateStore + text_dedup.incremental_dedup_pipeline
+ audio_dedup.incremental_audio_dedup).

The load-bearing property: batch 2 resolves against batch 1's CONTENT
without batch 1's parquet ever being re-read — proven by MOVING the
batch-1 input away before the batch-2 ingest (any lineage touching it
would fail the job)."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from data_validator_spark.operators.audio_dedup import incremental_audio_dedup
from data_validator_spark.operators.text_dedup import incremental_dedup_pipeline
from data_validator_spark.plans.snapshots import DedupStateStore

LONG_A = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark woods tonight without looking back even once"
)
LONG_B = (
    "completely different prose describing spark dataframes shuffle "
    "partitions adaptive execution and broadcast joins at petabyte scale"
)
LONG_C = (
    "a third unrelated passage about parquet row groups column pruning "
    "predicate pushdown and vectorized arrow readers in modern engines"
)


def _assign(res):
    return {r["id"]: (r["keep_id"], r["via"]) for r in res.assignments.collect()}


def test_text_batch2_resolves_without_rereading_batch1(spark, tmp_path):
    store = DedupStateStore(str(tmp_path / "state"))
    b1_dir = str(tmp_path / "batch1")
    spark.createDataFrame(
        [("a1", LONG_A), ("a2", LONG_B), ("a3", LONG_A)], ["doc_id", "text"]
    ).write.parquet(b1_dir)

    r1 = incremental_dedup_pipeline(
        spark.read.parquet(b1_dir), store, threshold=0.5
    )
    a1 = _assign(r1)
    assert a1 == {
        "a1": ("a1", "new"),
        "a2": ("a2", "new"),
        "a3": ("a1", "batch_dup"),
    }
    r1.unpersist()

    # batch-1 parquet GONE: the state alone must resolve batch 2
    shutil.move(b1_dir, str(tmp_path / "batch1_gone"))

    b2 = spark.createDataFrame(
        [
            ("b1", LONG_A),                      # exact re-ingest
            # near-dup of a2 — NO exact sibling in this batch, so it
            # must resolve through the persisted band buckets
            ("b2", LONG_B + " extra suffix"),
            ("b3", LONG_C),                      # genuinely new
            ("b4", LONG_C),                      # dup within batch 2
            ("b5", None),                        # null text: keeps itself
        ],
        ["doc_id", "text"],
    )
    r2 = incremental_dedup_pipeline(b2, store, threshold=0.5, state_margin=0.1)
    a2 = _assign(r2)
    assert a2["b1"] == ("a1", "exact_state")
    assert a2["b2"] == ("a2", "near_state")
    assert a2["b3"] == ("b3", "new")
    assert a2["b4"] == ("b3", "batch_dup")
    assert a2["b5"] == ("b5", "new")
    r2.unpersist()

    # state grew by exactly the new keeper's signature
    sig_ids = sorted(r["id"] for r in store.read(spark, "text_sig").collect())
    assert sig_ids == ["a1", "a2", "b3"]
    # null fp never lands in state
    assert (
        store.read(spark, "text_fp").filter("fp IS NULL").count() == 0
    )

    # batch 3: content from both prior batches resolves across batches
    b3 = spark.createDataFrame([("c1", LONG_C), ("c2", LONG_B)], ["doc_id", "text"])
    r3 = incremental_dedup_pipeline(b3, store, threshold=0.5)
    a3 = _assign(r3)
    assert a3 == {"c1": ("b3", "exact_state"), "c2": ("a2", "exact_state")}
    r3.unpersist()


def test_text_meta_mismatch_raises(spark, tmp_path):
    store = DedupStateStore(str(tmp_path / "state"))
    df = spark.createDataFrame([("a1", LONG_A)], ["doc_id", "text"])
    incremental_dedup_pipeline(df, store, n_hashes=64, bands=32).unpersist()
    with pytest.raises(ValueError, match="banding parameters"):
        incremental_dedup_pipeline(df, store, n_hashes=32, bands=16)


def _clips(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, codec string, bytes binary"
    )


def test_audio_batch2_resolves_without_rereading_batch1(spark, tmp_path):
    from data_validator_spark.audio import codecs, synth
    from data_validator_spark.audio.resample import resample

    store = DedupStateStore(str(tmp_path / "astate"))
    pcm0 = np.clip(synth.reference_pcm("rec0", 48000, 36000), -1, 1)
    pcm1 = np.clip(synth.reference_pcm("rec1", 48000, 36000), -1, 1)
    enc0 = bytearray(codecs.encode("pcm16", pcm0, 48000))
    enc1 = bytearray(codecs.encode("pcm16", pcm1, 48000))

    b1_dir = str(tmp_path / "abatch1")
    _clips(
        spark, [("a0", "pcm16", enc0), ("a1", "pcm16", enc1)]
    ).write.parquet(b1_dir)
    r1 = incremental_audio_dedup(spark.read.parquet(b1_dir), store)
    assert _assign(r1) == {"a0": ("a0", "new"), "a1": ("a1", "new")}
    r1.unpersist()

    shutil.move(b1_dir, str(tmp_path / "abatch1_gone"))

    # batch 2: byte re-ingest of rec0; cross-codec re-encode of rec1
    # (content match via stored embedding, EXACT cosine — rec1 has no
    # exact sibling in this batch, so the persisted bands must do it);
    # a new recording; an undecodable row
    pcm2 = np.clip(synth.reference_pcm("rec2", 48000, 36000), -1, 1)
    y1 = np.clip(resample(pcm1, 48000, 8000), -1, 1)
    b2 = _clips(
        spark,
        [
            ("b0", "pcm16", enc0),
            ("b1", "mulaw", bytearray(codecs.encode("mulaw", y1, 8000))),
            ("b2", "pcm16", bytearray(codecs.encode("pcm16", pcm2, 48000))),
            ("b3", "flac", bytearray(b"junk")),
        ],
    )
    r2 = incremental_audio_dedup(b2, store)
    a2 = _assign(r2)
    assert a2["b0"] == ("a0", "exact_state")
    assert a2["b1"] == ("a1", "near_state")
    assert a2["b2"] == ("b2", "new")
    assert a2["b3"] == ("b3", "new")  # undecodable keeps itself
    r2.unpersist()

    # only decodable new keepers contribute embeddings to state
    emb_ids = sorted(r["id"] for r in store.read(spark, "audio_emb").collect())
    assert emb_ids == ["a0", "a1", "b2"]

    # batch 3: re-ingest of batch-2 content resolves to batch-2 keeper
    b3 = _clips(
        spark, [("c0", "pcm16", bytearray(codecs.encode("pcm16", pcm2, 48000)))]
    )
    r3 = incremental_audio_dedup(b3, store)
    assert _assign(r3) == {"c0": ("b2", "exact_state")}
    r3.unpersist()


def test_audio_meta_mismatch_raises(spark, tmp_path):
    from data_validator_spark.audio import codecs, synth

    store = DedupStateStore(str(tmp_path / "astate"))
    pcm = np.clip(synth.reference_pcm("r", 48000, 24000), -1, 1)
    clips = _clips(
        spark, [("a0", "pcm16", bytearray(codecs.encode("pcm16", pcm, 48000)))]
    )
    incremental_audio_dedup(clips, store).unpersist()
    with pytest.raises(ValueError, match="banding parameters"):
        incremental_audio_dedup(clips, store, n_planes=8)
