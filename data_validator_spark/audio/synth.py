"""Deterministic audio + transcript synthesis recipe.

Everything is a pure function of ``clip_id`` (+ sr_hz / sample count),
so the validation engine can *recompute* the reference signal inside
the decode-check UDF without shipping golden waveforms around — the
audio analogue of the reference's recomputable rule oracles
(/root/reference/validators/VALIDATION_RULES.md truth tables).
"""

from __future__ import annotations

import zlib

import numpy as np

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu"
).split()


def clip_seed(clip_id: str) -> int:
    """Stable 32-bit seed derived from the clip id (crc32: stdlib,
    platform-independent, identical across executors)."""
    return zlib.crc32(clip_id.encode("utf-8")) & 0xFFFFFFFF


def reference_pcm(clip_id: str, sr_hz: int, n_samples: int) -> np.ndarray:
    """Reference signal: two deterministic sine partials + seeded noise.

    float32 end-to-end with in-place ops: this function runs once per
    row inside the decode-check UDF, and the float64 version's ~5
    temporary arrays per call made the check memory-bandwidth-bound at
    high core counts (the arrays are up to seconds x 48kHz long). Any
    float32-vs-float64 difference is ~1e-7 relative — orders of
    magnitude inside the 30 dB SNR gate.
    """
    seed = clip_seed(clip_id)
    f0 = 200.0 + (seed % 1800)
    f1 = 80.0 + ((seed >> 8) % 600)
    t = np.arange(n_samples, dtype=np.float32)
    t /= np.float32(sr_hz)
    y = t * np.float32(2.0 * np.pi * f1)
    np.sin(y, out=y)
    y *= np.float32(0.25)
    t *= np.float32(2.0 * np.pi * f0)
    np.sin(t, out=t)
    t *= np.float32(0.6)
    t += y
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(n_samples, dtype=np.float32)
    noise *= np.float32(0.01)
    t += noise
    return t


def reference_transcript(clip_id: str, n_words: int = 6) -> str:
    """Ground-truth transcript: seeded word sequence from a fixed vocab."""
    seed = clip_seed(clip_id)
    rng = np.random.default_rng(seed ^ 0x5EED)
    idx = rng.integers(0, len(_VOCAB), size=n_words)
    return " ".join(_VOCAB[i] for i in idx)
