"""Baseline JPEG codec (operators/jpeg.py) — pure numpy tests plus
the multimodal integration."""

import numpy as np
import pytest

from data_validator_spark.operators.jpeg import (
    JpegError,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(err * err)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_zigzag_is_the_standard_table():
    # first and last entries of the normative scan order
    assert list(_ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(_ZIGZAG) == list(range(64))


def test_gradient_roundtrip_high_psnr():
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (h + w))], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 40


def test_quality_controls_size_and_fidelity():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    lo, hi = encode_jpeg(img, quality=20), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(img, decode_jpeg(lo)) < _psnr(img, decode_jpeg(hi))


def test_grayscale_and_odd_shapes():
    rng = np.random.default_rng(5)
    g = (np.mgrid[0:30, 0:20][0] * 8).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g))
    assert dg.shape == g.shape and _psnr(g, dg) > 40
    for shape in [(1, 1, 3), (7, 9, 3), (8, 8, 3), (17, 3, 3), (9, 16)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(im)).shape == im.shape


def test_flat_image_is_near_exact():
    img = np.full((24, 24, 3), 77, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    assert int(np.abs(dec.astype(int) - 77).max()) <= 1


def test_deterministic():
    img = np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3)
    assert encode_jpeg(img) == encode_jpeg(img.copy())


def test_malformed_payloads_raise():
    img = np.zeros((16, 16, 3), np.uint8)
    good = encode_jpeg(img)
    for bad in [b"", b"nope", b"\xff\xd8\xff\xe0", good[:60], good[:-20]]:
        with pytest.raises(JpegError):
            decode_jpeg(bad)
    with pytest.raises(JpegError):
        encode_jpeg(img.astype(np.float32))
    # progressive SOF2 is explicitly rejected, not mis-decoded
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(JpegError):
        decode_jpeg(bytes(prog))


def test_multimodal_jpeg_branch(spark):
    from data_validator_spark.operators.multimodal import decode_image_features

    img = np.stack(
        [np.mgrid[0:12, 0:10][1] * 9 for _ in range(3)], axis=-1
    ).astype(np.uint8)
    rows = [
        ("jpg-ok", bytearray(encode_jpeg(img))),
        ("jpg-bad", bytearray(b"\xff\xd8\xff\xe0garbagegarbage")),
        ("video", bytearray(b"\x1a\x45\xdf\xa3xxxx")),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["id"]: r for r in decode_image_features(df).collect()}
    assert out["jpg-ok"]["decode_error"] is None
    assert out["jpg-ok"]["features"][0] == 12.0  # height survived
    assert "image_decode_failed(" in out["jpg-bad"]["decode_error"]
    assert out["video"]["decode_error"] == "image_format_unsupported(mkv)"


def test_chroma_420_subsampling():
    """4:2:0 (what real-world encoders emit): smaller files, chroma
    box-downsampled 2x2 on encode and nearest-upsampled on decode;
    MCU padding/cropping must survive every odd geometry."""
    h, w = 50, 70
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (h + w))], axis=-1
    ).astype(np.uint8)
    e444 = encode_jpeg(img, 85, "444")
    e420 = encode_jpeg(img, 85, "420")
    assert len(e420) < len(e444)
    d420 = decode_jpeg(e420)
    assert d420.shape == img.shape
    assert _psnr(img, d420) > 35  # chroma is lossy, luma is not
    rng = np.random.default_rng(9)
    for shape in [(1, 1, 3), (7, 9, 3), (15, 17, 3), (16, 16, 3), (33, 31, 3)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(im, 90, "420")).shape == im.shape
    with pytest.raises(JpegError):
        encode_jpeg(img, 85, "422")
