"""Pure-python MJPEG-in-AVI video codec + Spark feature plumbing.

The third REAL media family next to PNG/JPEG (operators/imaging.py,
operators/jpeg.py) and FLAC/ADPCM/mu-law (audio/): a video payload is
an opaque `binary` column holding a spec-shaped AVI (RIFF) container
whose frames are baseline JPEGs ("MJPG" fourcc), written and parsed
here with stdlib + numpy only — no media libraries (install
impossibility evidenced in BASELINE.md).

Scale design:
  - `probe_avi` reads ONLY the RIFF headers and the idx1 index — frame
    counting / fps / dimensions / sample planning never touch frame
    bytes, so a metadata pass over 10^12 clips stays proportional to
    header bytes, not video bytes.
  - `decode_avi_frames(payload, indices)` seeks each requested frame
    through the index (O(k) JPEG decodes for k sampled frames, never
    O(n_frames)) — the engine's evenly-spaced sampling rule is the same
    Column-side plan (multimodal.frame_sample_plan) so planner and
    decoder agree.
  - The Spark stage is an Arrow-batched mapInPandas with a minimal
    (id, payload) projection; outputs are fixed-width stats + a
    NORMALIZED decode_error (the reference's invalid_key/invalid_value
    error-row pattern, entity_controller.py:148-191): a NULL feature
    always says why.

Real-world codecs (H.264/VP9/AV1) have no pure-python decode path; such
payloads yield `video_format_unsupported(<fourcc>)` outcome rows rather
than silent NULLs. A production deployment adds a libav branch next to
the MJPEG one — nothing else changes.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_spark.operators import jpeg


class VideoError(ValueError):
    """Malformed or unsupported video payload."""


_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(form: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", form + body)


def encode_avi_mjpeg(
    frames: Sequence[np.ndarray],
    fps: int = 10,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """uint8 RGB frames (all same (H,W,3)) -> MJPEG-in-AVI bytes.

    Emits the standard single-stream layout: hdrl(avih + strl(strh
    'vids'/'MJPG' + strf BITMAPINFOHEADER)) + movi('00dc' JPEG chunks,
    word-aligned) + idx1 (one keyframe entry per frame — MJPEG is
    all-intra), so any spec-conforming AVI reader can open it.
    """
    if not frames:
        raise VideoError("no frames")
    h, w = frames[0].shape[:2]
    jpgs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise VideoError("frames disagree on dimensions")
        jpgs.append(jpeg.encode_jpeg(f, quality=quality, subsampling=subsampling))
    if fps <= 0:
        raise VideoError("fps must be positive")

    max_size = max(len(j) for j in jpgs)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,  # max bytes/sec (advisory)
        0,  # padding granularity
        _AVIF_HASINDEX,
        len(jpgs),  # total frames
        0,  # initial frames
        1,  # streams
        max_size,  # suggested buffer
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0,  # flags
        0, 0,  # priority, language
        0,  # initial frames
        1,  # scale
        fps,  # rate (rate/scale = fps)
        0,  # start
        len(jpgs),  # length in frames
        max_size,  # suggested buffer
        0xFFFFFFFF & -1,  # quality: -1 = default
        0,  # sample size (0: varying)
        0, 0, int(w), int(h),  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # planes
        24,  # bit count
        b"MJPG",
        max_size,  # biSizeImage (advisory)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray()
    idx = bytearray()
    for j in jpgs:
        # idx1 offsets point at the '00dc' fourcc, relative to the
        # position of the 'movi' form fourcc (the common convention)
        off = 4 + len(movi_body)
        movi_body += _chunk(b"00dc", j)
        idx += b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, len(j))
    movi = _list(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


@dataclass
class AviInfo:
    n_frames: int
    width: int
    height: int
    fps: float
    codec: str
    # (absolute payload offset of frame data, size) per frame
    frame_spans: list[tuple[int, int]]


def _iter_chunks(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise VideoError("truncated chunk")
        yield fourcc, body_start, size
        pos = body_start + size + (size & 1)


def probe_avi(payload: bytes) -> AviInfo:
    """Header + index scan only: never touches frame bytes.

    Frame locations come from idx1 when present (the O(index) path);
    a missing index falls back to one sequential movi walk (still
    chunk-header hops, not frame decodes).
    """
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF":
        raise VideoError("not a RIFF payload")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    if riff_size + 8 > len(buf):
        raise VideoError("truncated RIFF payload")
    form = buf[8:12]
    if form != b"AVI ":
        raise VideoError(f"not an AVI (form {form.decode('latin1').strip()!r})")
    end = 8 + riff_size

    n_frames = width = height = None
    fps = None
    codec = None
    movi_pos = None  # offset of the 'movi' fourcc
    idx_span = None
    for fourcc, body, size in _iter_chunks(buf, 12, end):
        if fourcc == b"LIST":
            form2 = buf[body : body + 4]
            if form2 == b"hdrl":
                for fc2, b2, s2 in _iter_chunks(buf, body + 4, body + size):
                    if fc2 == b"avih":
                        if s2 < 40:
                            raise VideoError("short avih header")
                        us_pf, _, _, _, total, _, _, _, w, h = struct.unpack_from(
                            "<IIIIIIIIII", buf, b2
                        )
                        n_frames, width, height = total, w, h
                        if us_pf:
                            fps = 1e6 / us_pf
                    elif fc2 == b"LIST" and buf[b2 : b2 + 4] == b"strl":
                        for fc3, b3, s3 in _iter_chunks(buf, b2 + 4, b2 + s2):
                            if fc3 == b"strh" and s3 >= 36:
                                typ = buf[b3 : b3 + 4]
                                if typ == b"vids":
                                    codec = (
                                        buf[b3 + 4 : b3 + 8]
                                        .decode("latin1")
                                        .strip("\x00 ")
                                    )
                                    scale, rate = struct.unpack_from(
                                        "<II", buf, b3 + 20
                                    )
                                    if scale:
                                        fps = rate / scale
            elif form2 == b"movi":
                movi_pos = body
        elif fourcc == b"idx1":
            idx_span = (body, size)

    if n_frames is None or codec is None:
        raise VideoError("missing avih/strh headers")
    if movi_pos is None:
        raise VideoError("missing movi list")

    spans: list[tuple[int, int]] = []
    if idx_span is not None:
        b, s = idx_span
        if s % 16:
            raise VideoError("malformed idx1")
        for off in range(b, b + s, 16):
            ckid = buf[off : off + 4]
            _, rel, size_i = struct.unpack_from("<III", buf, off + 4)
            if ckid[2:4] != b"dc":
                continue
            # rel points at the chunk fourcc, relative to 'movi' fourcc
            data = movi_pos + rel + 8
            if data + size_i > end:
                raise VideoError("idx1 entry out of bounds")
            spans.append((data, size_i))
    else:
        movi_end = None
        for fourcc, body, size in _iter_chunks(buf, 12, end):
            if fourcc == b"LIST" and buf[body : body + 4] == b"movi":
                movi_end = body + size
        for fc, b2, s2 in _iter_chunks(buf, movi_pos + 4, movi_end):
            if fc[2:4] == b"dc":
                spans.append((b2, s2))

    if len(spans) != n_frames:
        raise VideoError(
            f"frame count mismatch (avih {n_frames}, index {len(spans)})"
        )
    return AviInfo(
        n_frames=n_frames,
        width=int(width),
        height=int(height),
        fps=float(fps) if fps else 0.0,
        codec=codec or "",
        frame_spans=spans,
    )


# frame-decoder registry keyed by fourcc: MJPG is built-in (real
# baseline JPEG, operators/jpeg.py); a production deployment registers
# H264/VP9/AV1 via register_frame_decoder("H264", libav_decode) — the
# plug-in seam mirroring audio.codecs.register_pcm_decoder
_FRAME_DECODERS: dict[str, object] = {}


def register_frame_decoder(fourcc: str, decoder) -> None:
    """decoder(frame_bytes) -> uint8 array (H,W) or (H,W,3). Same
    cluster caveat as audio.codecs.register_pcm_decoder: register at
    import time of a --py-files module for executor visibility."""
    _FRAME_DECODERS[fourcc.upper()] = decoder


def _frame_decoder_for(codec: str):
    c = (codec or "").upper()
    if c == "MJPG":
        return jpeg.decode_jpeg
    return _FRAME_DECODERS.get(c)


def decode_avi_frames(
    payload: bytes, indices: Sequence[int] | None = None
) -> list[np.ndarray]:
    """Decode selected frames (all when indices is None) to uint8
    RGB arrays — index-seek, O(len(indices)) JPEG decodes."""
    info = probe_avi(payload)
    frame_decode = _frame_decoder_for(info.codec)
    if frame_decode is None:
        raise VideoError(f"unsupported video codec ({info.codec or 'unknown'})")
    buf = bytes(payload)
    if indices is None:
        indices = range(info.n_frames)
    out = []
    for i in indices:
        i = int(i)
        if not (0 <= i < info.n_frames):
            raise VideoError(f"frame index {i} out of range")
        off, size = info.frame_spans[i]
        try:
            px = frame_decode(buf[off : off + size])
        except (jpeg.JpegError, ValueError) as e:
            raise VideoError(f"frame {i} decode failed: {e}") from e
        if px.ndim == 2:
            px = np.stack([px] * 3, axis=2)
        if px.shape != (info.height, info.width, 3):
            raise VideoError(
                f"frame {i} dimensions {px.shape[:2]} disagree with header "
                f"({info.height}, {info.width})"
            )
        out.append(px)
    return out


def sample_indices(n_frames: int, k: int) -> list[int]:
    """Evenly-spaced frame sample — the python twin of the Column-side
    multimodal.frame_sample_plan (floor(i * n / k))."""
    if n_frames <= 0:
        return []
    return [min(n_frames - 1, (i * n_frames) // k) for i in range(k)]


_VIDEO_SCHEMA = (
    "id string, n_frames int, width int, height int, fps double, "
    "sampled array<int>, frame_means array<double>, decode_error string"
)


def decode_video_features(
    df: DataFrame,
    payload_col: str = "bytes",
    id_col: str = "clip_id",
    k_frames: int = 4,
    batch_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas video stage: probe the container, sample k frames
    evenly, decode ONLY those, and emit per-frame pixel means.

    Output: (id, n_frames, width, height, fps, sampled array<int>,
    frame_means array<double>, decode_error string). Error rows are
    normalized and non-silent:

      payload_missing                    NULL payload
      video_format_unsupported(<fmt>)    non-AVI magic (wav/png/...)
      video_codec_unsupported(<fourcc>)  AVI whose stream isn't MJPG
      video_decode_failed(<reason>)      malformed container / frame
    """
    from data_validator_spark.operators.multimodal import _sniff_py

    proj = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))
    if batch_partitions:
        proj = proj.repartition(batch_partitions, "id")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(p):
            null = (None, None, None, None, None, None)
            if p is None:
                return (*null, "payload_missing")
            b = bytes(p)
            fmt = _sniff_py(b[:12])
            if fmt != "avi":
                return (*null, f"video_format_unsupported({fmt})")
            try:
                info = probe_avi(b)
            except VideoError as e:
                return (*null, f"video_decode_failed({e})")
            head = (
                info.n_frames,
                info.width,
                info.height,
                info.fps,
            )
            if info.codec.upper() != "MJPG":
                return (
                    *head,
                    None,
                    None,
                    f"video_codec_unsupported({info.codec or 'unknown'})",
                )
            sampled = sample_indices(info.n_frames, k_frames)
            try:
                frames = decode_avi_frames(b, sampled)
            except VideoError as e:
                return (*head, sampled, None, f"video_decode_failed({e})")
            means = [float(fr.mean()) for fr in frames]
            return (*head, sampled, means, None)

        for pdf in batches:
            rows = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_frames": pd.array([r[0] for r in rows], dtype="Int32"),
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                    "fps": [r[3] for r in rows],
                    "sampled": [r[4] for r in rows],
                    "frame_means": [r[5] for r in rows],
                    "decode_error": [r[6] for r in rows],
                }
            )

    return proj.mapInPandas(extract, schema=_VIDEO_SCHEMA)
