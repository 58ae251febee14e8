"""Pure-python PNG codec (stdlib zlib + numpy only).

The sandbox has no imaging libraries (PIL/libav — install attempts
recorded in BASELINE.md), but PNG's container is simple enough to
implement for real: zlib-compressed filtered scanlines in IDAT
chunks. This gives the multimodal pipeline a REAL image decode path
— bytes -> pixel array -> features — instead of the crc32 stand-in,
for the PNG subset a training-data pipeline actually controls
(8-bit depth, greyscale/RGB/RGBA, non-interlaced).

Encoder writes filter-0 scanlines (valid, universally readable PNG);
decoder implements all five standard scanline filters (None/Sub/Up/
Average/Paeth), so externally-produced PNGs decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class ImageError(ValueError):
    """Raised when a payload cannot be decoded as a supported PNG."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) greyscale or (h, w, {2,3,4}) -> PNG bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] in (2, 3, 4):
        color_type = {2: 4, 3: 2, 4: 6}[px.shape[2]]
        channels = px.shape[2]
    else:
        raise ImageError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse PNG scanline filtering. None/Up/Sub are vectorized
    (Sub's recurrence out[x] = line[x] + out[x-bpp] is a per-channel
    prefix sum mod 256); Average/Paeth predict from BOTH the left and
    the upper pixel, which is inherently sequential in x — those rows
    fall back to a per-byte loop. Our own encoder emits filter 0
    everywhere (fully vectorized decode); the loop only runs for
    externally-produced PNGs, where a 10^12-row sweep would use
    libpng anyway."""
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 1:  # Sub: prefix sum per channel (uint8 wraps)
            cols = line.reshape(w, bpp)
            out[y] = np.cumsum(cols, axis=0, dtype=np.uint64).astype(
                np.uint8
            ).reshape(stride)
        elif ftype in (3, 4):  # Average / Paeth need left pixel
            cur = out[y]
            line_i = line.astype(np.int32)
            prev_i = prev.astype(np.int32)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 3:
                    val = line_i[x] + ((left + int(prev_i[x])) >> 1)
                else:  # Paeth
                    ul = int(out[y - 1][x - bpp]) if (y > 0 and x >= bpp) else 0
                    up = int(prev_i[x])
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    val = line_i[x] + pred
                cur[x] = val & 0xFF
        else:
            raise ImageError(f"unknown PNG filter type {ftype}")
    return out.reshape(h, w, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 pixel array (h, w, channels). Supports bit
    depth 8, color types 0/2/4/6, no interlace. Raises ImageError."""
    if payload is None:
        raise ImageError("null payload")
    data = bytes(payload)
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise ImageError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ImageError("truncated PNG chunk")
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ImageError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS:
        raise ImageError(f"unsupported PNG (depth={depth}, color={color_type})")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ImageError("unsupported PNG compression/filter/interlace")
    channels = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ImageError(f"PNG inflate failed: {e}") from e
    if len(raw) != h * (1 + w * channels):
        raise ImageError("PNG scanline size mismatch")
    return _unfilter(raw, h, w, channels)


def image_features(pixels: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic 8-dim feature vector from a pixel array: shape +
    per-channel mean/std over a luma-ish projection — the real analogue
    of the crc32 stand-in, cheap enough for a 10^12-row sweep."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    flat = px.reshape(-1, c)
    mean = float(flat.mean())
    std = float(flat.std())
    ch_means = [float(flat[:, i].mean()) for i in range(min(c, 3))]
    ch_means += [0.0] * (3 - len(ch_means))
    out = np.array(
        [float(h), float(w), float(c), mean, std, *ch_means], dtype=np.float64
    )
    return out[:dim]
