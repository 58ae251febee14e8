"""Pure-python codec/synth unit tests (no Spark)."""

import numpy as np
import pytest

from data_validator_spark.audio import codecs, synth


# per-codec SNR floors on the reference synth mix: pcm16/flac are
# (near-)lossless, mulaw/opus are lossy but clear the 30 dB engine
# gate, IMA ADPCM is REAL but slope-overloads on the 2 kHz-ish f0
# partials (measured 17-35 dB across srs) — the engine correctly
# quarantines it, and q64's oracle pins all_snr30=false for it
_SNR_FLOOR = {
    "pcm16": 80,
    "flac": 80,
    "mulaw": 30,
    "alaw": 30,
    "opus": 30,
    "adpcm": 15,
}


_PCM_CODECS = tuple(c for c in codecs.SUPPORTED_CODECS if c != "opus")


@pytest.mark.parametrize("codec", _PCM_CODECS)
def test_roundtrip_snr_above_gate(codec):
    pcm = synth.reference_pcm("clip-000000000042", 16000, 8000)
    payload = codecs.encode(codec, pcm, 16000)
    dec, sr = codecs.decode(codec, payload)
    assert sr == 16000
    assert len(dec) == len(pcm)
    assert codecs.snr_db(pcm, dec) >= _SNR_FLOOR[codec]


def test_opus_is_metadata_tier():
    """Opus: PCM decode honestly unsupported (PcmUnsupportedError, no
    synthetic pass); the REAL metadata tier roundtrips rate + duration
    from the Ogg container within the 2.5ms CELT grid."""
    pcm = synth.reference_pcm("clip-000000000042", 16000, 8000)
    payload = codecs.encode("opus", pcm, 16000)
    with pytest.raises(codecs.PcmUnsupportedError):
        codecs.decode("opus", payload)
    meta = codecs.inspect_metadata("opus", payload)
    assert meta["error"] is None
    assert meta["input_sr"] == 16000
    assert abs(meta["duration_ms"] - 500.0) <= 1.3


@pytest.mark.parametrize("codec", _PCM_CODECS)
def test_truncated_payload_raises(codec):
    pcm = synth.reference_pcm("clip-000000000001", 8000, 1000)
    payload = codecs.encode(codec, pcm, 8000)
    with pytest.raises(codecs.CodecError):
        codecs.decode(codec, payload[: len(payload) // 2])


def test_opus_truncated_payload_rejected_by_metadata_tier():
    pcm = synth.reference_pcm("clip-000000000001", 8000, 1000)
    payload = codecs.encode("opus", pcm, 8000)
    meta = codecs.inspect_metadata("opus", payload[: len(payload) // 2])
    assert meta["error"] is not None


def test_register_pcm_decoder_plugin_seam():
    """A native decoder (libopus in production) registers per codec and
    the whole PCM tier lights up with no engine edit."""
    import numpy as np

    def fake_decode(payload):
        return np.zeros(100, dtype=np.float32), 8000

    codecs.register_pcm_decoder("fakecodec", fake_decode)
    try:
        dec, sr = codecs.decode("fakecodec", b"anything")
        assert sr == 8000 and len(dec) == 100
    finally:
        codecs._DECODERS.pop("fakecodec", None)


def test_garbage_and_unknown_codec():
    with pytest.raises(codecs.CodecError):
        codecs.decode("pcm16", b"garbage")
    with pytest.raises(codecs.CodecError):
        codecs.decode("amr", b"\x00" * 100)
    with pytest.raises(codecs.CodecError):
        codecs.decode("pcm16", None)


def test_snr_detects_wrong_signal():
    a = synth.reference_pcm("clip-a", 16000, 4000)
    b = synth.reference_pcm("clip-b", 16000, 4000)
    assert codecs.snr_db(a, b) < 10.0
    assert codecs.snr_db(a, a) == float("inf")


def test_alaw_involution_all_codes():
    """G.711 property: decode places each code at its quantization-cell
    midpoint, so re-encoding the decoded sample reproduces the byte —
    for every one of the 256 possible A-law codes. This pins the
    implementation to the normative integer tables bit-for-bit (any
    off-by-one in segment bounds, mantissa shift, or the 0x55 AMI
    mask breaks some code)."""
    codes = np.arange(256, dtype=np.uint8)
    lin = codecs._alaw_to_linear(codes)
    assert lin.dtype == np.int16
    back = codecs._linear_to_alaw(lin)
    np.testing.assert_array_equal(back, codes)
    # sign symmetry: code c and c^0x80 decode to negatives of each other
    np.testing.assert_array_equal(
        codecs._alaw_to_linear(codes ^ 0x80).astype(np.int32), -lin.astype(np.int32)
    )


def test_alaw_full_scale_saturates_not_wraps():
    pcm = np.array([1.0, -1.0, 0.0], dtype=np.float32)
    dec, sr = codecs.decode("alaw", codecs.encode("alaw", pcm, 8000))
    assert sr == 8000
    # top segment midpoint (32256/32767), never wrapped sign
    assert dec[0] > 0.97 and dec[1] < -0.97 and abs(dec[2]) < 0.01


def test_synth_deterministic():
    x1 = synth.reference_pcm("clip-x", 22050, 2000)
    x2 = synth.reference_pcm("clip-x", 22050, 2000)
    np.testing.assert_array_equal(x1, x2)
    assert synth.reference_transcript("clip-x") == synth.reference_transcript("clip-x")
    assert synth.reference_transcript("clip-x") != synth.reference_transcript("clip-y")
