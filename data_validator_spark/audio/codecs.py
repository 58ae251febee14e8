"""Audio codec encode/decode, pure numpy + stdlib (no audio libraries
are available in this environment — see repo README).

Real codecs:
  - ``pcm16``: standard RIFF/WAVE 16-bit PCM container (fully real).
  - ``mulaw``: G.711 mu-law companding (real algorithm, ITU-T G.711)
    in a minimal ``MULW`` container.
  - ``flac``: REAL FLAC bitstream (audio/flac.py — pure-python subset
    codec: fixed/verbatim/constant subframes, rice residuals, CRC-8 +
    CRC-16 + MD5 verified; mono/16-bit encode, wider decode).

Stand-in codec (the *plumbing* — schema, per-codec dispatch, Arrow
batching, SNR math — is real; only the bitstream format is ours):
  - ``opus``: lossy stand-in, 12-bit quantization (``OPU0``) giving a
    deterministic ~72 dB SNR, comfortably above the 30 dB gate. Opus
    remains a stand-in because there is no pure-python path to
    CELT/SILK (a range-coded transform codec); a production deployment
    swaps this one branch for libopus, everything else is unchanged.

All decoders raise ``CodecError`` on malformed payloads — the engine
maps that to the ``audio_decode_failed`` hard violation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from data_validator_spark.audio import flac as _flac

SUPPORTED_CODECS = ("pcm16", "flac", "mulaw", "opus")

_WAV_FMT_PCM = 1
_MAGIC_MULAW = b"MULW"
_MAGIC_OPUS = b"OPU0"


class CodecError(ValueError):
    """Raised when a payload cannot be decoded."""


# ---------------------------------------------------------------- pcm16 / WAV


def _encode_wav_pcm16(pcm: np.ndarray, sr_hz: int) -> bytes:
    x = np.clip(pcm, -1.0, 1.0)
    i16 = (x * 32767.0).astype("<i2")
    data = i16.tobytes()
    byte_rate = sr_hz * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, _WAV_FMT_PCM, 1, sr_hz, byte_rate, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def _decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt ":
        raise CodecError("missing fmt chunk")
    fmt_size, audio_fmt, n_ch, sr_hz, _, _, bits = struct.unpack(
        "<IHHIIHH", payload[16:36]
    )
    if audio_fmt != _WAV_FMT_PCM or n_ch != 1 or bits != 16 or fmt_size != 16:
        raise CodecError("unsupported WAV format")
    if payload[36:40] != b"data":
        raise CodecError("missing data chunk")
    (n_bytes,) = struct.unpack("<I", payload[40:44])
    data = payload[44 : 44 + n_bytes]
    if len(data) != n_bytes or n_bytes % 2:
        raise CodecError("truncated WAV data")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    return pcm, sr_hz


# ---------------------------------------------------------------- G.711 mu-law

_MU = 255.0


def _encode_mulaw(pcm: np.ndarray, sr_hz: int) -> bytes:
    x = np.clip(pcm, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    u8 = np.round((y + 1.0) * 127.5).astype(np.uint8)
    return _MAGIC_MULAW + struct.pack("<IQ", sr_hz, len(u8)) + u8.tobytes()


def _decode_mulaw(payload: bytes) -> tuple[np.ndarray, int]:
    if len(payload) < 16 or payload[:4] != _MAGIC_MULAW:
        raise CodecError("not a MULW payload")
    sr_hz, n = struct.unpack("<IQ", payload[4:16])
    data = payload[16 : 16 + n]
    if len(data) != n:
        raise CodecError("truncated MULW data")
    y = np.frombuffer(data, dtype=np.uint8).astype(np.float32) / 127.5 - 1.0
    pcm = np.sign(y) * ((1.0 + _MU) ** np.abs(y) - 1.0) / _MU
    return pcm.astype(np.float32), sr_hz


# ---------------------------------------------------------------- flac (real)


def _encode_flac(pcm: np.ndarray, sr_hz: int) -> bytes:
    try:
        return _flac.encode_flac(pcm, sr_hz)
    except _flac.FlacError as e:
        raise CodecError(f"flac encode failed: {e}") from e


def _decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    try:
        return _flac.decode_flac(payload)
    except _flac.FlacError as e:
        raise CodecError(f"flac decode failed: {e}") from e


# ---------------------------------------------------------------- opus stand-in

_OPUS_BITS = 12
_OPUS_SCALE = float(2 ** (_OPUS_BITS - 1) - 1)


def _encode_opus(pcm: np.ndarray, sr_hz: int) -> bytes:
    q = np.round(np.clip(pcm, -1.0, 1.0) * _OPUS_SCALE).astype("<i2")
    comp = zlib.compress(q.tobytes(), level=1)
    return _MAGIC_OPUS + struct.pack("<IQ", sr_hz, len(q)) + comp


def _decode_opus(payload: bytes) -> tuple[np.ndarray, int]:
    if len(payload) < 16 or payload[:4] != _MAGIC_OPUS:
        raise CodecError("not an OPU0 payload")
    sr_hz, n = struct.unpack("<IQ", payload[4:16])
    try:
        raw = zlib.decompress(payload[16:])
    except zlib.error as e:
        raise CodecError(f"opus inflate failed: {e}") from e
    if len(raw) != n * 2:
        raise CodecError("opus sample-count mismatch")
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / _OPUS_SCALE
    return pcm, sr_hz


_ENCODERS = {
    "pcm16": _encode_wav_pcm16,
    "mulaw": _encode_mulaw,
    "flac": _encode_flac,
    "opus": _encode_opus,
}
_DECODERS = {
    "pcm16": _decode_wav_pcm16,
    "mulaw": _decode_mulaw,
    "flac": _decode_flac,
    "opus": _decode_opus,
}


def encode(codec: str, pcm: np.ndarray, sr_hz: int) -> bytes:
    try:
        enc = _ENCODERS[codec]
    except KeyError:
        raise CodecError(f"unknown codec {codec!r}") from None
    return enc(np.asarray(pcm, dtype=np.float32), int(sr_hz))


def decode(codec: str, payload: bytes) -> tuple[np.ndarray, int]:
    """-> (pcm float32 in [-1, 1], sr_hz). Raises CodecError."""
    if payload is None:
        raise CodecError("null payload")
    try:
        dec = _DECODERS[codec]
    except KeyError:
        raise CodecError(f"unknown codec {codec!r}") from None
    return dec(bytes(payload))


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """10*log10(sum(ref^2) / sum((ref-dec)^2)); inf when identical.

    The graft's per-row invariant (BASELINE.json input_hint): decoded
    PCM must be allclose to the reference recipe at SNR >= 30 dB.
    """
    ref = np.asarray(reference, dtype=np.float32)
    dec = np.asarray(decoded, dtype=np.float32)
    if ref.shape != dec.shape:
        return float("-inf")
    # dot-product forms: no squared temporaries, single pass each
    # (this runs once per row in the decode UDF; bandwidth matters)
    diff = ref - dec
    noise = float(np.dot(diff, diff))
    sig = float(np.dot(ref, ref))
    if noise == 0.0:
        return float("inf")
    if sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(sig / noise)
