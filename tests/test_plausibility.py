"""Transcript <-> audio plausibility rules (operators/plausibility.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_validator_spark.operators.plausibility import transcript_plausibility


def _rows(spark, rows, extra=""):
    return spark.createDataFrame(
        rows, "clip_id string, transcript string, dur_ms double" + extra
    )


def _by_id(df):
    return {r["clip_id"]: r for r in df.collect()}


def test_wps_window(spark):
    df = _rows(
        spark,
        [
            ("ok", "three words here", 1500.0),          # 2.0 wps
            ("fast", " ".join(["w"] * 20), 2000.0),      # 10 wps
            ("slow", "three words here", 30000.0),       # 0.1 wps
            ("short", "hi there", 100.0),                # < min_words: exempt
            ("nodur", "three words here", None),         # no duration: exempt
            ("nulltx", None, 5000.0),                    # null transcript
        ],
    )
    got = _by_id(transcript_plausibility(df))
    assert got["ok"]["_wps_label"] is None and got["ok"]["wps"] == 2.0
    assert got["fast"]["_wps_label"] == "transcript_rate_implausible(wps=10.0,words=20)"
    assert got["slow"]["_wps_label"] == "transcript_rate_implausible(wps=0.1,words=3)"
    assert got["short"]["_wps_label"] is None and got["short"]["wps"] is None
    assert got["nodur"]["_wps_label"] is None
    assert got["nulltx"]["_wps_label"] is None and got["nulltx"]["words"] == 0


def test_decoded_duration_beats_lying_metadata(spark):
    # metadata claims 1 s (2 wps, fine) but only 0.25 s decoded -> 8 wps
    df = spark.createDataFrame(
        [("liar", "one two", 1000.0, 2000, 8000)],
        "clip_id string, transcript string, dur_ms double, "
        "audio_n_samples long, audio_container_sr int",
    )
    got = _by_id(
        transcript_plausibility(
            df,
            n_samples_col="audio_n_samples",
            container_sr_col="audio_container_sr",
            min_words=2,
        )
    )
    assert got["liar"]["wps"] == 8.0
    assert got["liar"]["_wps_label"] == "transcript_rate_implausible(wps=8.0,words=2)"
    # decode failed (n_samples -1) -> falls back to metadata -> in range
    df2 = spark.createDataFrame(
        [("fb", "one two", 1000.0, -1, 8000)],
        "clip_id string, transcript string, dur_ms double, "
        "audio_n_samples long, audio_container_sr int",
    )
    got2 = _by_id(
        transcript_plausibility(
            df2,
            n_samples_col="audio_n_samples",
            container_sr_col="audio_container_sr",
            min_words=2,
        )
    )
    assert got2["fb"]["wps"] == 2.0 and got2["fb"]["_wps_label"] is None


def test_speech_share_rule(spark):
    df = spark.createDataFrame(
        [
            ("sil", " ".join(["w"] * 8), 4000.0, 0.95),   # share 0.05
            ("talk", " ".join(["w"] * 8), 4000.0, 0.10),  # share 0.9
            ("nullr", " ".join(["w"] * 8), 4000.0, None),
        ],
        "clip_id string, transcript string, dur_ms double, silence_ratio double",
    )
    got = _by_id(transcript_plausibility(df, silence_ratio_col="silence_ratio"))
    assert got["sil"]["_speech_label"] == "speech_share_low(share=0.05,words=8)"
    assert got["talk"]["_speech_label"] is None
    assert got["nullr"]["_speech_label"] is None


def test_validation_plan_integration(spark, tmp_path):
    """The rules ride the single decode pass inside run_validation:
    a silent clip with a long transcript earns speech_share_low, an
    over-dense transcript earns the wps label, a clean pairing earns
    neither — all in messages, none flip the hard tier."""
    from data_validator_spark.audio import codecs, synth
    from data_validator_spark.plans import ValidationConfig, run_validation

    sr = 8000
    tone = np.clip(synth.reference_pcm("p0", sr, 2 * sr), -1, 1)
    rows = [
        # 2 s tone, 4 words -> 2 wps, full speech share: clean
        ("p0", 0, "2026-01-01", "pcm16", sr, "four words right here",
         2000.0, bytearray(codecs.encode("pcm16", tone, sr))),
        # 2 s silence, 12 words -> speech_share_low (wps 6.0 in range)
        ("p1", 1, "2026-01-01", "pcm16", sr, " ".join(["w"] * 12),
         2000.0, bytearray(codecs.encode("pcm16", np.zeros(2 * sr, np.float32), sr))),
        # 2 s tone, 30 words -> 15 wps
        ("p2", 2, "2026-01-01", "pcm16", sr, " ".join(["w"] * 30),
         2000.0, bytearray(codecs.encode("pcm16", tone, sr))),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, ingest_seq long, ingest_date string, codec string, "
        "sr_hz int, transcript string, dur_ms double, bytes binary",
    )
    res = run_validation(
        clips,
        cfg=ValidationConfig(
            check_quality=True, check_plausibility=True, persist=False
        ),
    )
    v = {r["clip_id"]: r for r in res.validated.collect()}
    assert "speech_share_low" in v["p1"]["validation_msg_clip"]
    assert "transcript_rate_implausible(wps=15.0,words=30)" in v["p2"]["validation_msg_clip"]
    assert "speech_share_low" not in v["p0"]["validation_msg_clip"]
    assert "transcript_rate_implausible" not in v["p0"]["validation_msg_clip"]
    # soft tier only: silence quality label may fire, but rows remain
    assert len(v) == 3
