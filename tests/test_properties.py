"""Property-based tests (hypothesis) for the pure-python kernels the
distributed plans lean on: codec roundtrips, SNR math, PNG roundtrip,
binomial CDF, and the generator's per-row hash streams. These run
without a SparkSession — the Spark plumbing is covered elsewhere; the
properties here pin the NUMERICAL contracts the UDFs promise."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_validator_spark.audio import codecs
from data_validator_spark.fixtures.clips import _u01
from data_validator_spark.operators import imaging
from data_validator_spark.operators.grouped import _binom_cdf_scalar

pcm_arrays = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=1,
    max_size=512,
).map(lambda xs: np.asarray(xs, dtype=np.float32))


@settings(max_examples=40, deadline=None)
@given(pcm=pcm_arrays, sr=st.sampled_from([8000, 16000, 44100]))
def test_pcm16_and_flac_roundtrip_above_snr_gate(pcm, sr):
    """Lossless-ish codecs must reconstruct above the 30 dB gate for
    ANY signal with audible energy (16-bit quantization gives ~90 dB
    for full-scale; tiny signals can quantize to silence, so gate on
    energy)."""
    for codec in ("pcm16", "flac"):
        out, sr2 = codecs.decode(codec, codecs.encode(codec, pcm, sr))
        assert sr2 == sr and len(out) == len(pcm)
        if float(np.max(np.abs(pcm))) > 1e-2:
            assert codecs.snr_db(pcm, out) > 30.0


@settings(max_examples=40, deadline=None)
@given(pcm=pcm_arrays)
def test_mulaw_roundtrip_snr(pcm):
    """G.711 mu-law: ~38 dB SNR on speech-scale signals; assert the
    gate holds whenever the signal has real energy."""
    out, _ = codecs.decode("mulaw", codecs.encode("mulaw", pcm, 8000))
    if float(np.sqrt(np.mean(pcm**2))) > 0.05:
        assert codecs.snr_db(pcm, out) > 30.0


@settings(max_examples=30, deadline=None)
@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    c=st.sampled_from([1, 3, 4]),
)
def test_png_roundtrip_any_pixels(data, h, w, c):
    raw = data.draw(
        st.binary(min_size=h * w * c, max_size=h * w * c), label="pixels"
    )
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
    arr = px[:, :, 0] if c == 1 else px
    out = imaging.decode_png(imaging.encode_png(arr))
    assert np.array_equal(out, px.reshape(h, w, c))


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=200),
    p=st.floats(min_value=0.01, max_value=0.99),
    data=st.data(),
)
def test_binom_cdf_properties(n, p, data):
    k = data.draw(st.integers(min_value=0, max_value=n), label="k")
    cdf = _binom_cdf_scalar(k, n, p)
    assert 0.0 <= cdf <= 1.0
    # monotone in k; total mass 1 at k=n
    if k < n:
        assert _binom_cdf_scalar(k + 1, n, p) >= cdf - 1e-12
    assert abs(_binom_cdf_scalar(n, n, p) - 1.0) < 1e-9
    # complement identity vs direct pmf sum (independent arithmetic)
    pmf_sum = sum(
        math.comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(0, k + 1)
    )
    assert abs(cdf - min(pmf_sum, 1.0)) < 1e-9


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    salt=st.integers(min_value=0, max_value=64),
    start=st.integers(min_value=0, max_value=10**9),
)
def test_generator_hash_stream_uniform_and_stable(seed, salt, start):
    """The clips generator's per-row uniform stream must be (a) in
    [0,1), (b) identical for identical (idx, seed, salt) — the
    determinism every oracle and golden fixture rests on, and (c)
    different streams for different salts (w.h.p.)."""
    idx = np.arange(start, start + 256, dtype=np.int64)
    u1 = _u01(idx, seed, salt)
    u2 = _u01(idx, seed, salt)
    assert np.array_equal(u1, u2)
    assert float(u1.min()) >= 0.0 and float(u1.max()) < 1.0
    other = _u01(idx, seed, salt + 1)
    assert not np.array_equal(u1, other)


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_flac_decoder_total_on_garbage(data):
    """decode_flac is TOTAL over arbitrary bytes: it either decodes or
    raises the typed FlacError — never an IndexError/struct.error/
    OverflowError escaping from the bitstream reader. A validator's
    decode stage meets adversarial payloads by design."""
    from data_validator_spark.audio.flac import FlacError, decode_flac

    try:
        decode_flac(data)
    except FlacError:
        pass


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_flac_decoder_total_on_corrupted_prefix(data):
    """Same totality with a valid magic + plausible header prefix
    grafted on, which drives the parser deeper before it fails."""
    from data_validator_spark.audio import synth
    from data_validator_spark.audio.flac import (
        FlacError,
        decode_flac,
        encode_flac,
    )

    good = encode_flac(synth.reference_pcm("fuzz", 8000, 1600), 8000)
    try:
        decode_flac(good[:60] + data)
    except FlacError:
        pass


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_opus_inspect_total_on_garbage(data):
    """opus.inspect returns a dict with an `error` field for malformed
    containers instead of raising anything but OpusError."""
    from data_validator_spark.audio import opus

    try:
        meta = opus.inspect(data)
        assert isinstance(meta, dict) and "error" in meta
    except opus.OpusError:
        pass


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_adpcm_and_alaw_total_on_garbage(data):
    """The remaining binary codec parsers share the totality bar."""
    from data_validator_spark.audio import codecs

    for codec in ("adpcm", "alaw", "mulaw", "pcm16"):
        try:
            codecs.decode(codec, data)
        except codecs.CodecError:
            pass
