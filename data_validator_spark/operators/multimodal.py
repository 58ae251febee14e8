"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Image/audio/video payloads are `binary` columns; everything metadata-
level (magic sniffing, sizes, frame-sample planning) is JVM Column
expressions, and the decode/feature stages are mapInPandas pipelines
whose Spark-side shape (schema, batching, partitioning) is real.

Image decode is REAL for PNG and JPEG: operators/imaging.py
implements the PNG container (zlib scanlines, all five filters) and
operators/jpeg.py a baseline-sequential JPEG codec (Annex K tables,
4:4:4, numpy DCT), both pure numpy+stdlib, so `decode_image_features`
turns PNG/JPEG bytes into pixel statistics with no imaging library.
Video is REAL for MJPEG-in-AVI (operators/video.py: RIFF container
parse, idx1 index-seek, per-frame JPEG decode); compressed codecs
(H.264/VP9/...) have no pure-python decode path in this sandbox
(install attempts recorded in BASELINE.md) and yield NULL features
with a NORMALIZED unsupported-format reason; `fake=True` substitutes
a deterministic hash-derived vector for ANY payload so the
distributed plumbing is exercisable on non-image fixtures. A
production deployment adds a libav branch next to the PNG/JPEG/MJPEG
ones — nothing else changes.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAGIC_HEX = {
    "89504E47": "png",  # real decode path: operators/imaging.py
    "FFD8FFE0": "jpeg",  # real decode path: operators/jpeg.py
    "FFD8FFE1": "jpeg",  # (JFIF / EXIF / bare-DQT / Adobe headers)
    "FFD8FFDB": "jpeg",
    "FFD8FFEE": "jpeg",
    "52494646": "riff",  # RIFF container — refined to wav/avi by form type
    "664C6143": "flac",  # real FLAC bitstream (audio/flac.py)
    "4D554C57": "mulaw_standin",
    "4F676753": "ogg",  # Ogg encapsulation (real Ogg-Opus clips)
    "1A45DFA3": "mkv",
}


def sniff_format(payload: Column) -> Column:
    """Container format from magic bytes — pure Column expr. RIFF
    payloads are refined by their form type (bytes 9-12): 'WAVE' ->
    wav, 'AVI ' -> avi, anything else stays riff."""
    prefix = F.upper(F.hex(F.substring(payload, 1, 4)))
    out = F.lit("unknown")
    for magic, fmt in _MAGIC_HEX.items():
        out = F.when(prefix == magic, F.lit(fmt)).otherwise(out)
    form = F.substring(payload, 9, 4).cast("string")
    out = F.when(
        prefix == "52494646",
        F.when(form == "WAVE", F.lit("wav"))
        .when(form == "AVI ", F.lit("avi"))
        .otherwise(F.lit("riff")),
    ).otherwise(out)
    return F.when(payload.isNull(), F.lit(None)).otherwise(out)


def payload_metadata(df: DataFrame, payload_col: str = "bytes") -> DataFrame:
    """Typed metadata columns: byte length + sniffed container format."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "payload_len": F.length(p),
            "payload_format": sniff_format(p),
        }
    )


def frame_sample_plan(
    n_frames: Column, k: int
) -> Column:
    """Deterministic evenly-spaced frame indices (video frame-sample
    planning): k indices in [0, n_frames) — a Column array, computed
    without touching the payload."""
    return F.when(
        n_frames > 0,
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.floor(i * n_frames / k).cast("int"),
        ),
    )


_IMG_FEATURE_DIM = 8


def _fake_rgb(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode (STUB — see module
    docstring): derives an 8-dim feature vector from a crc32 stream."""
    seed = zlib.crc32(payload or b"") & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return rng.random(_IMG_FEATURE_DIM).astype(np.float64)


_MAGIC_BYTES = {bytes.fromhex(h): f for h, f in _MAGIC_HEX.items()}


def _sniff_py(payload: bytes) -> str:
    """Python-side twin of sniff_format (same magic table + RIFF form
    refinement; pass at least the first 12 bytes for RIFF payloads)."""
    for magic, fmt in _MAGIC_BYTES.items():
        if payload[:4] == magic:
            if fmt == "riff":
                form = payload[8:12]
                if form == b"WAVE":
                    return "wav"
                if form == b"AVI ":
                    return "avi"
            return fmt
    return "unknown"


def decode_image_features(
    df: DataFrame,
    payload_col: str = "bytes",
    id_col: str = "clip_id",
    fake: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas image-feature extraction:
    (id, features array<double>, decode_error string).

    Real path (fake=False): PNG and JPEG payloads decode for real
    (pure-python codecs, operators/imaging.py + operators/jpeg.py)
    into shape/mean/std features with decode_error NULL. A NULL
    feature vector always comes with a NORMALIZED reason (the
    reference's invalid_key/invalid_value error pattern,
    entity_controller.py:148-191) instead of failing silently:

      image_format_unsupported(<fmt>)  non-image magic (riff/mkv/..)
      image_decode_failed(<reason>)    image magic, malformed payload
      payload_missing                  NULL payload

    fake=True swaps in the deterministic crc32 stand-in for every
    non-NULL payload (used when the fixture's payloads are audio, not
    images). The Arrow batching, minimal projection, and
    repartition-before-decode are the production shape either way.
    """
    proj = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))
    if batch_partitions:
        proj = proj.repartition(batch_partitions, "id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from data_validator_spark.operators import imaging, jpeg

        def one(p) -> tuple[list | None, str | None]:
            if p is None:
                return None, "payload_missing"
            if fake:
                return _fake_rgb(p).tolist(), None
            fmt = _sniff_py(bytes(p[:12]))
            if fmt == "png":
                try:
                    return (
                        imaging.image_features(imaging.decode_png(p)).tolist(),
                        None,
                    )
                except imaging.ImageError as e:
                    return None, f"image_decode_failed({e})"
            if fmt == "jpeg":
                try:
                    return (
                        imaging.image_features(jpeg.decode_jpeg(p)).tolist(),
                        None,
                    )
                except jpeg.JpegError as e:
                    return None, f"image_decode_failed({e})"
            return None, f"image_format_unsupported({fmt})"

        for pdf in batches:
            feats, errs = [], []
            for p in pdf["payload"]:
                f_, e_ = one(p)
                feats.append(f_)
                errs.append(e_)
            yield pd.DataFrame(
                {"id": pdf["id"], "features": feats, "decode_error": errs}
            )

    return proj.mapInPandas(
        extract,
        schema="id string, features array<double>, decode_error string",
    )
