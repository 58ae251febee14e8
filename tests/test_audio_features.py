"""Log-mel content embeddings for cross-codec audio dedup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_validator_spark.audio import codecs, synth
from data_validator_spark.audio.features import (
    audio_embeddings,
    log_mel_embedding,
    make_embedding_udf,
    mel_filterbank,
)
from data_validator_spark.audio.resample import resample


def test_filterbank_shape_and_rate_independence():
    """Area-normalized triangles: each filter sums to 1, the band
    layout covers the same 50..4000 Hz at every rate so embeddings
    computed at different rates live in the same space."""
    for sr, n_fft in ((8000, 200), (48000, 1200)):
        fb = mel_filterbank(sr, n_fft, 40)
        assert fb.shape == (40, n_fft // 2 + 1)
        sums = fb.sum(axis=1)
        assert np.allclose(sums[sums > 0], 1.0)
    # peak frequency of the last filter is near fmax at both rates
    bins8 = np.fft.rfftfreq(200, 1 / 8000)
    bins48 = np.fft.rfftfreq(1200, 1 / 48000)
    f8 = bins8[mel_filterbank(8000, 200, 40)[-1].argmax()]
    f48 = bins48[mel_filterbank(48000, 1200, 40)[-1].argmax()]
    assert abs(f8 - f48) < 150


def test_embedding_normalized_and_deterministic():
    pcm = synth.reference_pcm("e1", 16000, 16000)
    v = log_mel_embedding(pcm, 16000)
    assert v.shape == (80,)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    assert np.array_equal(v, log_mel_embedding(pcm.copy(), 16000))
    # sub-frame clip -> zero vector
    assert not log_mel_embedding(np.zeros(10, np.float32), 16000).any()


def test_same_content_across_codec_and_rate_is_near():
    """The whole point: a 48k original and its 8k mulaw re-encode
    byte-differ everywhere but embed nearly identically, while a
    different recording does not."""
    pcm = np.clip(synth.reference_pcm("dup", 48000, 48000), -1, 1)
    e = log_mel_embedding(pcm, 48000, 64)
    y = np.clip(resample(pcm, 48000, 8000), -1, 1)
    dec, _ = codecs.decode("mulaw", codecs.encode("mulaw", y, 8000))
    e_re = log_mel_embedding(dec, 8000, 64)
    other = log_mel_embedding(
        synth.reference_pcm("not-dup", 48000, 48000), 48000, 64
    )
    assert float(np.dot(e, e_re)) > 0.99
    assert float(np.dot(e, other)) < float(np.dot(e, e_re))


def test_audio_embeddings_operator(spark):
    pcm = np.clip(synth.reference_pcm("op", 16000, 16000), -1, 1)
    rows = [
        ("ok", "pcm16", bytearray(codecs.encode("pcm16", pcm, 16000))),
        ("bad", "flac", bytearray(b"not flac")),
    ]
    df = spark.createDataFrame(rows, "clip_id string, codec string, bytes binary")
    out = {r.clip_id: r for r in audio_embeddings(df).collect()}
    assert out["ok"].embed_error is None and len(out["ok"].embedding) == 80
    assert abs(sum(v * v for v in out["ok"].embedding) - 1.0) < 1e-4
    assert out["bad"].embed_error is not None and out["bad"].embedding is None


def test_embedding_udf_plugin_seam(spark):
    def fake_decode(payload):
        return np.frombuffer(bytes(payload), dtype=np.float32), 16000

    pcm = synth.reference_pcm("pl", 16000, 16000)
    df = spark.createDataFrame(
        [("pl", "fakecodec", bytearray(pcm.astype(np.float32).tobytes()))],
        "clip_id string, codec string, bytes binary",
    )
    assert make_embedding_udf(32, {"fakecodec": fake_decode}) is not None
    out = audio_embeddings(
        df, n_mels=32, plugins={"fakecodec": fake_decode}
    ).collect()[0]
    assert out.embed_error is None and len(out.embedding) == 64


def test_fused_quality_pass_emits_embedding(spark):
    """One decode serves invariant + quality + embedding: the fused
    run_quality_checks(embed_mels=...) output must match the
    standalone audio_embeddings vector exactly."""
    from data_validator_spark.audio.quality import run_quality_checks

    pcm = np.clip(synth.reference_pcm("fuse", 16000, 16000), -1, 1)
    df = spark.createDataFrame(
        [("fuse", "pcm16", 16000, bytearray(codecs.encode("pcm16", pcm, 16000)))],
        "clip_id string, codec string, sr_hz int, bytes binary",
    )
    fused = run_quality_checks(df, embed_mels=64).collect()[0]
    standalone = audio_embeddings(df, n_mels=64).collect()[0]
    assert fused.embedding == standalone.embedding
    assert len(fused.embedding) == 128
    assert fused.audio_snr_db is not None  # invariant rode the same pass


def test_validation_plan_embed_knob(spark, clips, transcripts_ref):
    """quality_embed_mels flows through the full plan: validated rows
    carry the embedding column; default config does not."""
    from data_validator_spark.plans.validation import (
        ValidationConfig,
        run_validation,
    )

    res = run_validation(
        clips,
        transcripts_ref,
        cfg=ValidationConfig(check_quality=True, quality_embed_mels=32),
    )
    assert "embedding" in res.validated.columns
    row = res.validated.filter(
        res.validated.embedding.isNotNull()
    ).select("embedding").first()
    assert row is not None and len(row.embedding) == 64
    res2 = run_validation(
        clips, transcripts_ref, cfg=ValidationConfig(check_quality=True)
    )
    assert "embedding" not in res2.validated.columns


def test_zero_norm_embedding_yields_null_cosine_not_crash(spark):
    """Digital silence embeds as the zero vector; under ANSI mode the
    cosine must come back NULL, not DIVIDE_BY_ZERO."""
    from data_validator_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert got[0].c is None and got[1].c == 1.0
