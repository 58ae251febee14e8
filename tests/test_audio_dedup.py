"""End-to-end audio dedup pipeline."""

from __future__ import annotations

import numpy as np

from data_validator_spark.audio import codecs, synth
from data_validator_spark.audio.resample import resample
from data_validator_spark.operators.audio_dedup import (
    AudioDedupResult,
    audio_dedup_pipeline,
)


def _corpus(spark):
    rows = []
    for i in range(8):
        cid = f"rec{i}"
        pcm = np.clip(synth.reference_pcm(cid, 48000, 36000), -1, 1)
        base = codecs.encode("pcm16", pcm, 48000)
        rows.append((f"{cid}-a", "pcm16", bytearray(base)))
        if i < 2:  # byte-identical copies
            rows.append((f"{cid}-b", "pcm16", bytearray(base)))
        if 2 <= i < 4:  # cross-codec re-encodes
            y = np.clip(resample(pcm, 48000, 8000), -1, 1)
            rows.append(
                (f"{cid}-c", "mulaw", bytearray(codecs.encode("mulaw", y, 8000)))
            )
    # an undecodable payload must survive as its own keeper
    rows.append(("broken", "flac", bytearray(b"junk")))
    # digital silence -> zero embedding -> its own keeper, no crash
    rows.append(
        ("silent", "pcm16",
         bytearray(codecs.encode("pcm16", np.zeros(48000, np.float32), 48000)))
    )
    return spark.createDataFrame(
        rows, "clip_id string, codec string, bytes binary"
    )


def test_pipeline_recovers_planted_structure(spark):
    res = audio_dedup_pipeline(_corpus(spark))
    assert isinstance(res, AudioDedupResult)
    keepers = {r.id: r for r in res.keepers.collect()}
    assert len(keepers) == 14  # 8 + 2 + 2 + broken + silent
    kept = [i for i, r in keepers.items() if r.is_keeper]
    assert len(kept) == 10  # 8 recordings + broken + silent
    # exact tier paired the byte copies
    exact = {(r.keep_id, r.dup_id) for r in res.exact_pairs.collect()}
    assert ("rec0-a", "rec0-b") in exact and ("rec1-a", "rec1-b") in exact
    # embedding tier paired the re-encodes
    emb = {(r.id_a, r.id_b) for r in res.embedding_pairs.collect()}
    assert ("rec2-a", "rec2-c") in emb and ("rec3-a", "rec3-c") in emb
    # unanalyzable rows keep themselves
    assert keepers["broken"].is_keeper and keepers["silent"].is_keeper
    res.unpersist()


def test_dropped_ids_are_exactly_the_planted_dups(spark):
    res = audio_dedup_pipeline(_corpus(spark))
    dropped = sorted(
        r.id for r in res.keepers.filter("not is_keeper").collect()
    )
    assert dropped == ["rec0-b", "rec1-b", "rec2-c", "rec3-c"]
    res.unpersist()
