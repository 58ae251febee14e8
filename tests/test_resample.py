"""Kaiser-windowed-sinc sample-rate normalization."""

from __future__ import annotations

import numpy as np
import pytest

from data_validator_spark.audio import codecs
from data_validator_spark.audio.resample import (
    make_resample_udf,
    resample,
    resample_clips,
)


def _tone(freq, sr, n, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / sr)).astype(
        np.float32
    )


def _snr_trim(ref, got, trim=200):
    a = ref[trim:-trim].astype(np.float64)
    b = got[trim:-trim].astype(np.float64)
    e = a - b
    return 10 * np.log10(np.dot(a, a) / max(np.dot(e, e), 1e-300))


@pytest.mark.parametrize(
    "sr_in,sr_out", [(8000, 16000), (48000, 16000), (44100, 16000), (16000, 48000)]
)
def test_tone_preserved_across_rates(sr_in, sr_out):
    x = _tone(997, sr_in, sr_in)
    y = resample(x, sr_in, sr_out)
    assert len(y) == sr_out  # exactly 1 s at the new rate
    ref = _tone(997, sr_out, len(y))
    assert _snr_trim(ref, y) > 60


def test_antialiasing_removes_superniquist_content():
    """An 11 kHz tone downsampled to 16 kHz (8 kHz Nyquist) must be
    filtered out, not folded back into the band."""
    x = _tone(11025, 48000, 48000)
    y = resample(x, 48000, 16000)
    body = y[200:-200].astype(np.float64)
    assert 20 * np.log10(np.sqrt(np.mean(body * body)) + 1e-12) < -35


def test_identity_and_edges():
    x = np.random.default_rng(3).standard_normal(1234).astype(np.float32)
    assert np.array_equal(resample(x, 16000, 16000), x)
    assert len(resample(np.zeros(0, np.float32), 8000, 16000)) == 0
    # output length is the exact floor(n * sr_out / sr_in)
    assert len(resample(x, 16000, 22050)) == 1234 * 22050 // 16000


def test_resample_clips_operator(spark):
    rows = [
        ("a", "pcm16", 8000, bytearray(codecs.encode("pcm16", _tone(997, 8000, 8000), 8000))),
        ("b", "pcm16", 16000, bytearray(codecs.encode("pcm16", _tone(997, 16000, 16000), 16000))),
        ("c", "pcm16", 8000, bytearray(b"\x00\x01garbage")),  # undecodable
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, codec string, sr_hz int, bytes binary"
    )
    out = {r.clip_id: r for r in resample_clips(df, 16000).collect()}
    assert out["a"].sr_hz == 16000 and out["a"].resample_error is None
    pcm, sr = codecs.decode("pcm16", out["a"].bytes)
    assert sr == 16000 and _snr_trim(_tone(997, 16000, len(pcm)), pcm) > 60
    # failed decode: payload and sr pass through unchanged, error noted
    assert out["c"].resample_error is not None
    assert bytes(out["c"].bytes) == bytes(rows[2][3]) and out["c"].sr_hz == 8000


def test_resample_udf_plugin_seam(spark):
    def fake_decode(payload):
        return np.frombuffer(bytes(payload), dtype=np.float32), 8000

    x = _tone(997, 8000, 8000)
    df = spark.createDataFrame(
        [("p", "fakecodec", 8000, bytearray(x.tobytes()))],
        "clip_id string, codec string, sr_hz int, bytes binary",
    )
    ctor_covered = make_resample_udf(16000, plugins={"fakecodec": fake_decode})
    assert ctor_covered is not None
    out = resample_clips(
        df, 16000, plugins={"fakecodec": fake_decode}
    ).collect()[0]
    assert out.resample_error is None and out.codec == "pcm16"
    pcm, sr = codecs.decode("pcm16", out.bytes)
    assert sr == 16000 and len(pcm) == 16000
