"""Pure-python PNG codec + the real image-feature decode path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_validator_spark.operators import imaging


def _gradient(h, w, c=3):
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 7 + ch * 31) % 256 + y % 2 for ch in range(c)], axis=2
    ).astype(np.uint8)
    return px


def test_png_roundtrip_rgb():
    px = _gradient(13, 17, 3)
    out = imaging.decode_png(imaging.encode_png(px))
    assert out.shape == (13, 17, 3)
    assert np.array_equal(out, px)


def test_png_roundtrip_grey_and_rgba():
    g = _gradient(9, 5, 3)[:, :, 0]
    out = imaging.decode_png(imaging.encode_png(g))
    assert out.shape == (9, 5, 1) and np.array_equal(out[:, :, 0], g)
    rgba = _gradient(6, 4, 4)
    out4 = imaging.decode_png(imaging.encode_png(rgba))
    assert np.array_equal(out4, rgba)


def _encode_with_filter(px: np.ndarray, ftype: int) -> bytes:
    """Minimal re-encoder emitting a chosen per-scanline filter so the
    decoder's unfilter paths (Sub/Up/Average/Paeth) are exercised with
    externally-shaped input."""
    h, w, c = px.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for yy in range(h):
        line = px[yy].reshape(-1).astype(np.int32)
        f = bytearray([ftype])
        for x in range(w * c):
            left = int(line[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # 4: Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            f.append((int(line[x]) - pred) & 0xFF)
        raw += f
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_decoder_handles_all_filters(ftype):
    px = _gradient(8, 11, 3)
    out = imaging.decode_png(_encode_with_filter(px, ftype))
    assert np.array_equal(out, px), f"filter {ftype}"


def test_png_malformed_raises():
    with pytest.raises(imaging.ImageError):
        imaging.decode_png(b"not a png at all")
    good = imaging.encode_png(_gradient(4, 4))
    with pytest.raises(imaging.ImageError):
        imaging.decode_png(good[: len(good) // 2])
    with pytest.raises(imaging.ImageError):
        imaging.decode_png(None)


def test_image_features_are_pixel_stats():
    px = _gradient(10, 20, 3)
    f = imaging.image_features(px)
    assert f[0] == 10 and f[1] == 20 and f[2] == 3
    assert f[3] == pytest.approx(px.astype(float).mean())
    assert f[4] == pytest.approx(px.astype(float).std())


def test_decode_image_features_real_png_path(spark):
    pngs = [
        (str(i), bytearray(imaging.encode_png(_gradient(6 + i, 9, 3))))
        for i in range(5)
    ]
    pngs.append(("bad", bytearray(b"\x00\x01garbage")))
    pngs.append(("null", None))
    df = spark.createDataFrame(pngs, "clip_id string, bytes binary")
    from data_validator_spark.operators.multimodal import decode_image_features

    rows = decode_image_features(df, fake=False).collect()
    out = {r.id: r.features for r in rows}
    errs = {r.id: r.decode_error for r in rows}
    for i in range(5):
        exp = imaging.image_features(_gradient(6 + i, 9, 3))
        assert out[str(i)] == pytest.approx(list(exp))
        assert errs[str(i)] is None
    assert out["bad"] is None and out["null"] is None
    # NULL features always come with a normalized reason, never silently
    assert errs["bad"] == "image_format_unsupported(unknown)"
    assert errs["null"] == "payload_missing"


def test_decode_image_features_normalized_error_outcomes(spark):
    """Corrupt payloads with image magic must yield normalized
    image_decode_failed(...) outcome rows (the reference's
    invalid_key/invalid_value error pattern) — jpeg is a REAL decode
    branch since round 3 (operators/jpeg.py), so a jpeg-magic payload
    with a garbage body is a decode FAILURE, not an unsupported
    format; truly unsupported containers (mkv) keep the
    image_format_unsupported(<fmt>) reason."""
    from data_validator_spark.operators.multimodal import decode_image_features

    corrupt_jpeg = bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    corrupt_png = bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    mkv = bytearray(b"\x1a\x45\xdf\xa3" + b"\x00" * 8)
    df = spark.createDataFrame(
        [("j", corrupt_jpeg), ("p", corrupt_png), ("v", mkv)],
        "clip_id string, bytes binary",
    )
    rows = {r.id: r for r in decode_image_features(df, fake=False).collect()}
    assert rows["j"].features is None
    assert rows["j"].decode_error.startswith("image_decode_failed(")
    assert rows["p"].features is None
    assert rows["p"].decode_error.startswith("image_decode_failed(")
    assert rows["v"].features is None
    assert rows["v"].decode_error == "image_format_unsupported(mkv)"
