"""Audio quality features (audio/quality.py) + IMA ADPCM specifics.

The pure-numpy analyze_pcm tests need no Spark; the operator test
rides the shared session fixture.
"""

import numpy as np
import pytest

from data_validator_spark.audio import codecs, synth
from data_validator_spark.audio.quality import analyze_pcm


def test_clean_clip_features():
    sr, n = 16000, 8000
    pcm = synth.reference_pcm("clip-q", sr, n)
    f = analyze_pcm(pcm, sr)
    assert f["clipping_ratio"] == 0.0
    assert abs(f["dc_offset"]) < 0.01
    assert f["silence_ratio"] == 0.0
    assert -20 < f["rms_db"] < 0
    # dominant frequency must land on the recipe's f0 partial
    import zlib

    seed = zlib.crc32(b"clip-q") & 0xFFFFFFFF
    f0 = 200.0 + (seed % 1800)
    assert abs(f["dominant_freq_hz"] - f0) <= 2 * sr / n
    assert f["spectral_flatness"] < 0.1  # tonal, not noise


def test_planted_defects_move_the_right_feature():
    sr, n = 16000, 8000
    base = synth.reference_pcm("clip-q2", sr, n)
    clipped = analyze_pcm(np.clip(base * 3.5, -1, 1), sr)
    assert clipped["clipping_ratio"] > 0.1
    dc = analyze_pcm(base * 0.5 + 0.2, sr)
    assert dc["dc_offset"] == pytest.approx(0.2, abs=0.01)
    silent = analyze_pcm(np.zeros(n, np.float32), sr)
    assert silent["silence_ratio"] == 1.0
    assert silent["rms_db"] == float("-inf")
    noise = analyze_pcm(
        np.random.default_rng(7).standard_normal(n).astype(np.float32) * 0.1, sr
    )
    assert noise["spectral_flatness"] > 0.5  # noise is flat


def test_analyze_deterministic_and_empty():
    sr = 8000
    pcm = synth.reference_pcm("clip-q3", sr, 2000)
    a, b = analyze_pcm(pcm, sr), analyze_pcm(pcm.copy(), sr)
    assert a.keys() == b.keys()
    for k in a:  # NaN-aware equality (sub-400ms clip: loudness is NaN)
        assert a[k] == b[k] or (np.isnan(a[k]) and np.isnan(b[k])), k
    empty = analyze_pcm(np.zeros(0, np.float32), sr)
    assert all(np.isnan(v) for v in empty.values())


def test_adpcm_bitexact_container_and_state():
    """Decoder state (predictor/index adaptation) must mirror the
    encoder exactly: re-encoding the decoded signal is a fixed point
    (idempotent transcode) — a strong check that both sides run the
    same normative IMA tables."""
    pcm = synth.reference_pcm("clip-adpcm", 16000, 4001)  # odd length
    enc1 = codecs.encode("adpcm", pcm, 16000)
    dec1, sr = codecs.decode("adpcm", enc1)
    assert sr == 16000 and len(dec1) == 4001
    enc2 = codecs.encode("adpcm", dec1, 16000)
    dec2, _ = codecs.decode("adpcm", enc2)
    assert codecs.snr_db(dec1, dec2) > 60  # near-fixed-point
    # single-sample and empty clips survive the nibble packing
    for k in (0, 1, 2, 3):
        d, _ = codecs.decode(
            "adpcm", codecs.encode("adpcm", pcm[:k], 16000)
        )
        assert len(d) == k


def test_run_quality_checks_operator(spark):
    from data_validator_spark.audio.quality import run_quality_checks

    sr, n = 16000, 8000
    rows = []
    for cid, plant in [
        ("ok-1", "clean"),
        ("bad-clip", "clipped"),
        ("bad-dc", "dc"),
        ("bad-silent", "silent"),
        ("bad-payload", "garbage"),
    ]:
        pcm = synth.reference_pcm(cid, sr, n)
        if plant == "clipped":
            pcm = np.clip(pcm * 3.5, -1, 1)
        elif plant == "dc":
            pcm = pcm * 0.5 + 0.2
        elif plant == "silent":
            pcm = np.zeros(n, np.float32)
        payload = (
            b"not audio" if plant == "garbage" else codecs.encode("pcm16", pcm, sr)
        )
        rows.append((cid, "pcm16", sr, bytearray(payload), plant))
    df = spark.createDataFrame(
        rows, "clip_id string, codec string, sr_hz int, bytes binary, planted string"
    )
    out = {r["clip_id"]: r for r in run_quality_checks(df).collect()}
    assert out["ok-1"]["_quality_labels"] is None
    assert "audio_clipping(" in out["bad-clip"]["_quality_labels"]
    assert "audio_dc_offset(" in out["bad-dc"]["_quality_labels"]
    assert "audio_silent(" in out["bad-silent"]["_quality_labels"]
    assert out["bad-payload"]["audio_decode_error"] is not None
    assert out["bad-payload"]["_quality_labels"] is None
    # the fused pass also carries the SNR invariant
    assert out["ok-1"]["audio_snr_db"] > 80


def test_duration_consistency_label(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.audio.checks import duration_consistency_label

    rows = [
        # (dur_ms, n_samples, container_sr) -> flag?
        ("ok", 1000, 16000, 16000),        # exact
        ("jitter", 1030, 16000, 16000),    # +30ms < 50 tol
        ("drift", 1500, 16000, 16000),     # +500ms
        ("null_dur", None, 16000, 16000),
        ("not_decoded", 1000, -1, -1),     # UDF sentinel for skip/error
    ]
    df = spark.createDataFrame(
        rows, "id string, dur_ms int, n_samples long, container_sr int"
    )
    out = {
        r["id"]: r["lab"]
        for r in df.select(
            "id",
            duration_consistency_label(
                F.col("dur_ms"), F.col("n_samples"), F.col("container_sr")
            ).alias("lab"),
        ).collect()
    }
    assert out["ok"] is None and out["jitter"] is None
    assert out["drift"] == "dur_ms_mismatch(1000.0)"
    assert out["null_dur"] is None and out["not_decoded"] is None


def test_near_match_label(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.functions.scalars import near_match_label

    rows = [
        ("a", "kitten", "kitten"),
        ("b", "kitten", "sitten"),
        ("c", "kitten", "sitting"),
        ("d", "kitten", "abcdefgh"),
        ("e", "kitten", None),
    ]
    df = spark.createDataFrame(rows, "id string, x string, y string")
    out = {
        r["id"]: r["lab"]
        for r in df.select(
            "id", near_match_label(F.col("x"), F.col("y"), 3).alias("lab")
        ).collect()
    }
    assert out["a"] == "exact"
    assert out["b"] == "near_match(1)"
    assert out["c"] == "near_match(3)"
    assert out["d"].startswith("mismatch(")
    assert out["e"] is None


def test_pipeline_check_quality_stage(spark, fixture_paths):
    """check_quality=True: the SAME single decode pass yields feature
    columns in the validated output and folds quality labels into
    messages — a planted silent payload flips valid_clip with an
    audio_silent label, everything else matches the default run."""
    from pyspark.sql import functions as F

    from data_validator_spark.plans import ValidationConfig, run_validation

    clips = spark.read.parquet(fixture_paths["clips"])
    victim = (
        clips.filter(F.col("bytes").isNotNull() & (F.col("codec") == "pcm16"))
        .select("clip_id", "sr_hz")
        .first()
    )
    silent = codecs.encode(
        "pcm16", np.zeros(int(victim["sr_hz"]), np.float32), int(victim["sr_hz"])
    )
    planted = clips.withColumn(
        "bytes",
        F.when(
            F.col("clip_id") == victim["clip_id"], F.lit(bytearray(silent))
        ).otherwise(F.col("bytes")),
    )
    res = run_validation(planted, cfg=ValidationConfig(check_quality=True))
    cols = set(res.validated.columns)
    assert {"clipping_ratio", "silence_ratio", "dominant_freq_hz"} <= cols
    row = res.validated.filter(F.col("clip_id") == victim["clip_id"]).first()
    assert row is not None
    assert row["silence_ratio"] == 1.0
    assert "audio_silent(" in row["validation_msg_clip"]
    assert row["valid_clip"] is False

    base = run_validation(clips, cfg=ValidationConfig())
    n_q = res.validated.filter(F.col("valid_clip")).count()
    n_b = base.validated.filter(F.col("valid_clip")).count()
    # clean synth clips trip no quality flags; only the plant differs
    assert n_b - n_q == (1 if base.validated.filter(
        (F.col("clip_id") == victim["clip_id"]) & F.col("valid_clip")
    ).count() else 0)


def test_bandwidth_feature_pure():
    import numpy as np

    from data_validator_spark.audio.quality import analyze_pcm

    rng = np.random.RandomState(7)
    sr, n = 48000, 24000
    full = (rng.standard_normal(n) * 0.2).astype(np.float32)
    low = rng.standard_normal(n // 8) * 0.2
    up = np.interp(np.arange(n) / 8.0, np.arange(n // 8), low).astype(np.float32)
    assert analyze_pcm(full, sr)["bandwidth_hz"] / (sr / 2) > 0.9
    assert analyze_pcm(up, sr)["bandwidth_hz"] / (sr / 2) < 0.25
    assert analyze_pcm(np.zeros(n, np.float32), sr)["bandwidth_hz"] == 0.0


def test_upsample_rule_opt_in(spark):
    import numpy as np

    from data_validator_spark.audio import codecs
    from data_validator_spark.audio.quality import run_quality_checks

    rng = np.random.RandomState(11)
    sr, n = 16000, 8000
    full = (rng.standard_normal(n) * 0.2).astype(np.float32)
    low = rng.standard_normal(n // 8) * 0.2
    up = np.interp(np.arange(n) / 8.0, np.arange(n // 8), low).astype(np.float32)
    rows = [
        ("full-0", "pcm16", sr, codecs.encode("pcm16", full, sr)),
        ("up-0", "pcm16", sr, codecs.encode("pcm16", up, sr)),
    ]
    df = spark.createDataFrame(rows, "clip_id string, codec string, sr_hz int, bytes binary")
    # default: rule disabled, labels don't mention upsampling
    off = {r["clip_id"]: r["_quality_labels"] for r in run_quality_checks(df).collect()}
    assert all(lbl is None or "upsampled" not in lbl for lbl in off.values())
    on = {
        r["clip_id"]: r["_quality_labels"]
        for r in run_quality_checks(df, upsample_min_ratio=0.25).collect()
    }
    assert on["up-0"] is not None and "audio_upsampled(" in on["up-0"]
    assert on["full-0"] is None or "audio_upsampled" not in on["full-0"]


def test_effective_bits_rule(spark):
    import numpy as np

    from data_validator_spark.audio import codecs, synth
    from data_validator_spark.audio.quality import run_quality_checks

    sr, n = 16000, 8000
    full = synth.reference_pcm("eb-full", sr, n)
    ints = (
        np.round(full.astype(np.float64) * 32767).clip(-32768, 32767).astype(np.int32)
    )
    q8 = (((ints >> 8) << 8).astype(np.float64) / 32767.0).astype(np.float32)
    rows = [
        ("eb-full", "pcm16", sr, codecs.encode("pcm16", full, sr)),
        ("eb-q8", "pcm16", sr, codecs.encode("pcm16", q8, sr)),
    ]
    df = spark.createDataFrame(rows, "clip_id string, codec string, sr_hz int, bytes binary")
    got = {
        r["clip_id"]: r
        for r in run_quality_checks(df, min_effective_bits=12).collect()
    }
    assert got["eb-full"]["effective_bits"] == 16.0
    assert got["eb-q8"]["effective_bits"] == 8.0
    assert "audio_low_bitdepth(8)" in (got["eb-q8"]["_quality_labels"] or "")
    assert "low_bitdepth" not in (got["eb-full"]["_quality_labels"] or "")
    # default: rule off
    off = {r["clip_id"]: r["_quality_labels"] for r in run_quality_checks(df).collect()}
    assert all(lbl is None or "low_bitdepth" not in lbl for lbl in off.values())


def test_quality_only_knobs_require_quality_flag(spark):
    """round-5 ADVICE: lufs/embed/clipping knobs are consumed only by
    the fused quality pass — setting one with quality=False must raise,
    not silently produce a run with the rule missing."""
    from data_validator_spark.audio.checks import run_audio_checks

    df = spark.createDataFrame(
        [("c1", "pcm16", 16000, None)],
        "clip_id string, codec string, sr_hz int, bytes binary",
    )
    with pytest.raises(ValueError, match="lufs_min.*quality=True"):
        run_audio_checks(df, lufs_min=-30.0)
    with pytest.raises(ValueError, match="embed_mels"):
        run_audio_checks(df, embed_mels=32, quality=False)
    # quality=True with the same knobs is the supported path
    assert "audio_snr_db" in run_audio_checks(
        df, quality=True, lufs_min=-30.0
    ).columns
