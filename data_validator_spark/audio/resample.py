"""Sample-rate normalization: Kaiser-windowed-sinc resampling — the
corpus-normalization step every mixed-rate audio corpus runs before
training (one canonical rate in, e.g. 16 kHz mono out).

Reference parity: the reference normalizes VALUES per field (language
short-codes -> BCP-47, core_models.py:815-846); this is the audio
content analogue — payloads normalized to one canonical sample rate.

DSP: arbitrary-ratio windowed-sinc interpolation. For output position
p (in input-sample units), y[j] = sum_k x[k] * h(p - k) over the
2*half_taps-tap neighborhood, with

    h(t) = c * sinc(c * t) * kaiser(t / half_taps; beta)

where c = rolloff * min(sr_out/sr_in, 1) — the anti-aliasing cutoff
for downsampling (unity-gain passband), plain band-limited
interpolation for upsampling. beta=8.6 gives ~90 dB stopband (the
classic Kaiser figure). Fully vectorized: one (n_out x taps) gather +
row-wise dot product, no per-sample python.

Known, documented behavior at the clip edges: the first/last
half_taps output samples see zero-padding (transient); quality
comparisons trim them.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from data_validator_spark.audio import codecs

DEFAULT_HALF_TAPS = 16
DEFAULT_BETA = 8.6
DEFAULT_ROLLOFF = 0.945


def resample(
    x: np.ndarray,
    sr_in: int,
    sr_out: int,
    half_taps: int = DEFAULT_HALF_TAPS,
    beta: float = DEFAULT_BETA,
    rolloff: float = DEFAULT_ROLLOFF,
) -> np.ndarray:
    """float32 pcm at sr_in -> float32 pcm at sr_out (length
    floor(n * sr_out / sr_in)). Identity when rates match."""
    if sr_in == sr_out:
        return np.asarray(x, dtype=np.float32)
    x = np.asarray(x, dtype=np.float64)
    n_in = len(x)
    n_out = int(n_in * sr_out // sr_in)
    if n_in == 0 or n_out == 0:
        return np.zeros(0, np.float32)
    g = math.gcd(sr_in, sr_out)
    m, l = sr_in // g, sr_out // g  # noqa: E741 - standard L/M names
    k = np.arange(-half_taps + 1, half_taps + 1, dtype=np.int64)
    c = rolloff * min(sr_out / sr_in, 1.0)
    pad = half_taps + 1
    xp = np.concatenate([np.zeros(pad), x, np.zeros(pad)])
    y = np.empty(n_out, np.float32)
    # Chunk the output positions: the gather materializes several
    # (block x 2*half_taps) float64 temporaries (t, h, win, idx) — an
    # unchunked hour-long 48 kHz clip would allocate tens of GB in one
    # executor. 1 Mi positions x 32 taps x ~5 temporaries ~= 1.3 GB
    # peak regardless of clip length; bit-identical to the one-shot
    # form (each output row's arithmetic is independent).
    block = 1 << 20
    for s in range(0, n_out, block):
        j = np.arange(s, min(s + block, n_out), dtype=np.int64)
        # exact rational positions: p = j * M / L in input-sample units
        base = (j * m) // l
        frac = ((j * m) % l).astype(np.float64) / l
        # t = p - (base + k) = frac - k
        t = frac[:, None] - k[None, :]
        h = c * np.sinc(c * t)
        w_arg = t / half_taps
        inside = np.abs(w_arg) <= 1.0
        win = np.zeros_like(t)
        win[inside] = np.i0(
            beta * np.sqrt(1.0 - w_arg[inside] * w_arg[inside])
        ) / np.i0(beta)
        h *= win
        idx = base[:, None] + k[None, :]
        y[s : s + len(j)] = (xp[idx + pad] * h).sum(axis=1)
    return y


_SCHEMA = T.StructType(
    [
        T.StructField("decode_error", T.StringType()),
        T.StructField("bytes_out", T.BinaryType()),
        T.StructField("n_samples_out", T.LongType()),
    ]
)


def make_resample_udf(
    target_sr: int,
    out_codec: str = "pcm16",
    plugins: dict | None = None,
):
    """Decode -> resample -> re-encode pandas UDF (one payload pass)."""

    @pandas_udf(_SCHEMA)
    def _resample_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            err = np.full(n, None, dtype=object)
            out = np.full(n, None, dtype=object)
            cnt = np.full(n, -1, dtype=np.int64)
            codec_col = pdf["codec"].to_numpy()
            payloads = pdf["bytes"].to_numpy()
            for i in range(n):
                try:
                    pcm, sr = codecs.decode(
                        codec_col[i], payloads[i], plugins=plugins
                    )
                    y = resample(pcm, sr, target_sr)
                    out[i] = codecs.encode(
                        out_codec, np.clip(y, -1.0, 1.0), target_sr
                    )
                    cnt[i] = len(y)
                except codecs.CodecError as e:
                    err[i] = str(e)
            yield pd.DataFrame(
                {
                    "decode_error": err,
                    "bytes_out": out,
                    "n_samples_out": cnt,
                }
            )

    return _resample_udf


def resample_clips(
    clips: DataFrame,
    target_sr: int,
    out_codec: str = "pcm16",
    plugins: dict | None = None,
) -> DataFrame:
    """Normalize every clip to `target_sr`: replaces `bytes`/`sr_hz`
    (and `codec` with `out_codec`), adds `resample_error` for payloads
    that failed decode (their bytes pass through unchanged so the
    violation path still owns them). The payload is read in ONE scan,
    transformed in the UDF, and never shuffled."""
    udf = make_resample_udf(target_sr, out_codec, plugins)
    res = udf(F.struct(F.col("clip_id"), F.col("codec"), F.col("bytes")))
    out = clips.withColumn("_rs", res)
    ok = F.col("_rs.decode_error").isNull()
    return (
        out.withColumn(
            "bytes", F.when(ok, F.col("_rs.bytes_out")).otherwise(F.col("bytes"))
        )
        .withColumn(
            "sr_hz",
            F.when(ok, F.lit(target_sr)).otherwise(F.col("sr_hz")),
        )
        .withColumn(
            "codec", F.when(ok, F.lit(out_codec)).otherwise(F.col("codec"))
        )
        .withColumn("resample_error", F.col("_rs.decode_error"))
        .drop("_rs")
    )
