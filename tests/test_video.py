"""MJPEG-in-AVI video codec + Spark video-feature stage."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_validator_spark.operators import video


def _frame(h: int, w: int, f: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.clip(x * 5 + f * 11 + ch * 17, 0, 255) for ch in range(3)], axis=2
    ).astype(np.uint8)


def _avi(n=6, h=24, w=32, fps=12, **kw) -> bytes:
    return video.encode_avi_mjpeg([_frame(h, w, f) for f in range(n)], fps=fps, **kw)


class TestAviCodec:
    def test_roundtrip_probe_and_decode(self):
        avi = _avi(n=7)
        assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
        info = video.probe_avi(avi)
        assert (info.n_frames, info.width, info.height) == (7, 32, 24)
        assert info.fps == pytest.approx(12.0)
        assert info.codec == "MJPG"
        frames = video.decode_avi_frames(avi)
        assert len(frames) == 7
        for f, dec in enumerate(frames):
            assert dec.shape == (24, 32, 3)
            err = np.abs(dec.astype(float) - _frame(24, 32, f).astype(float))
            assert err.mean() < 1.0  # JPEG-lossy but close

    def test_sampled_decode_matches_full(self):
        avi = _avi(n=9)
        full = video.decode_avi_frames(avi)
        idx = video.sample_indices(9, 4)
        assert idx == [0, 2, 4, 6]
        sub = video.decode_avi_frames(avi, idx)
        for got, i in zip(sub, idx):
            assert np.array_equal(got, full[i])

    def test_chroma_subsampled_frames(self):
        avi = _avi(n=3, h=24, w=32, subsampling="420")
        dec = video.decode_avi_frames(avi, [1])
        err = np.abs(dec[0].astype(float) - _frame(24, 32, 1).astype(float))
        assert err.mean() < 1.5

    def test_probe_never_touches_frame_bytes(self):
        avi = bytearray(_avi(n=5))
        info = video.probe_avi(bytes(avi))
        # corrupt every frame's data region; the header/index probe
        # must still succeed with identical metadata
        for off, size in info.frame_spans:
            avi[off : off + size] = b"\xff" * size
        info2 = video.probe_avi(bytes(avi))
        assert info2 == info
        with pytest.raises(video.VideoError, match="decode failed"):
            video.decode_avi_frames(bytes(avi), [0])

    def test_malformed_payloads(self):
        avi = _avi(n=4)
        with pytest.raises(video.VideoError, match="RIFF"):
            video.probe_avi(b"nope" + avi[4:])
        with pytest.raises(video.VideoError, match="truncated"):
            video.probe_avi(avi[:40])
        wav = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
        with pytest.raises(video.VideoError, match="not an AVI"):
            video.probe_avi(wav)
        bad = bytearray(avi)
        pos = avi.find(b"MJPG", avi.find(b"strh"))
        bad[pos : pos + 4] = b"H264"
        with pytest.raises(video.VideoError, match="unsupported video codec"):
            video.decode_avi_frames(bytes(bad))

    def test_index_frame_count_mismatch_detected(self):
        avi = bytearray(_avi(n=4))
        # lower avih total-frames without touching idx1
        pos = bytes(avi).find(b"avih") + 8 + 16
        avi[pos : pos + 4] = struct.pack("<I", 3)
        with pytest.raises(video.VideoError, match="frame count mismatch"):
            video.probe_avi(bytes(avi))

    def test_encoder_input_validation(self):
        with pytest.raises(video.VideoError, match="no frames"):
            video.encode_avi_mjpeg([])
        with pytest.raises(video.VideoError, match="dimensions"):
            video.encode_avi_mjpeg([_frame(8, 8, 0), _frame(8, 9, 1)])
        with pytest.raises(video.VideoError, match="fps"):
            video.encode_avi_mjpeg([_frame(8, 8, 0)], fps=0)

    def test_sample_indices_rule(self):
        assert video.sample_indices(10, 4) == [0, 2, 5, 7]
        assert video.sample_indices(2, 4) == [0, 0, 1, 1]
        assert video.sample_indices(0, 4) == []


class TestVideoStage:
    def test_decode_video_features_stage(self, spark):
        import pandas as pd

        def gen(batches):
            # self-contained: executors cannot import the test module
            import struct as _struct

            import numpy as _np
            import pandas as _pd

            from data_validator_spark.operators import video as _v

            def avi(n, fps=10):
                frames = [
                    _np.stack(
                        [
                            _np.clip(
                                _np.mgrid[0:24, 0:32][1] * 5 + f * 11 + ch * 17,
                                0,
                                255,
                            )
                            for ch in range(3)
                        ],
                        axis=2,
                    ).astype(_np.uint8)
                    for f in range(n)
                ]
                return _v.encode_avi_mjpeg(frames, fps=fps)

            for pdf in batches:
                ids, payloads = [], []
                for i in pdf["id"]:
                    i = int(i)
                    if i == 0:
                        ids.append("null_payload")
                        payloads.append(None)
                    elif i == 1:
                        ids.append("wav_payload")
                        payloads.append(
                            bytearray(b"RIFF" + _struct.pack("<I", 4) + b"WAVE")
                        )
                    elif i == 2:
                        ids.append("truncated_avi")
                        payloads.append(bytearray(avi(3)[:64]))
                    else:
                        ids.append(f"clip_{i}")
                        payloads.append(bytearray(avi(3 + i % 3, fps=10)))
                yield _pd.DataFrame({"clip_id": ids, "bytes": payloads})

        df = spark.range(0, 12, numPartitions=2).withColumnRenamed(
            "id", "id"
        ).mapInPandas(gen, "clip_id string, bytes binary")
        out = video.decode_video_features(df, k_frames=2, batch_partitions=2)
        rows = {r.id: r for r in out.collect()}
        assert len(rows) == 12
        assert rows["null_payload"].decode_error == "payload_missing"
        assert rows["wav_payload"].decode_error == "video_format_unsupported(wav)"
        assert rows["truncated_avi"].decode_error.startswith("video_decode_failed(")
        ok = [r for r in rows.values() if r.decode_error is None]
        assert len(ok) == 9
        for r in ok:
            assert (r.width, r.height) == (32, 24)
            assert r.fps == pytest.approx(10.0)
            assert len(r.sampled) == 2 and len(r.frame_means) == 2
            # frame mean of the gradient is analytic:
            # mean over x of clip(5x + 11f + 17ch) with no clipping at
            # these sizes -> 5*(w-1)/2 + 11*f + 17
            for m, fi in zip(r.frame_means, r.sampled):
                assert m == pytest.approx(5 * 31 / 2 + 11 * fi + 17, abs=1.0)

    def test_sniff_format_refines_riff(self, spark):
        from data_validator_spark.operators.multimodal import payload_metadata

        import pandas as pd

        avi = _avi(n=2)
        wav = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"\x00" * 16
        pdf = pd.DataFrame(
            {
                "clip_id": ["a", "w", "r", "n"],
                "bytes": [
                    bytearray(avi),
                    bytearray(wav),
                    bytearray(b"RIFF\x04\x00\x00\x00XXXX"),
                    None,
                ],
            }
        )
        df = spark.createDataFrame(pdf, "clip_id string, bytes binary")
        fmts = {
            r.clip_id: r.payload_format for r in payload_metadata(df).collect()
        }
        assert fmts == {"a": "avi", "w": "wav", "r": "riff", "n": None}

    def test_column_plan_agrees_with_python_sampler(self, spark):
        from data_validator_spark.operators.multimodal import frame_sample_plan

        df = spark.range(1, 40).select(
            F.col("id").cast("int").alias("n"),
            frame_sample_plan(F.col("id").cast("int"), 4).alias("plan"),
        )
        for r in df.collect():
            assert list(r.plan) == video.sample_indices(r.n, 4), r.n


def test_register_frame_decoder_plugin_seam():
    """A synthetic fourcc decoder registers and decode_avi_frames uses
    it with no engine edit — the libav swap seam for H264/VP9/AV1."""
    import numpy as np

    from data_validator_spark.operators import video

    payload = video.encode_avi_mjpeg(
        [np.zeros((16, 16, 3), dtype=np.uint8)] * 3, fps=10
    )
    # rewrite the codec fourcc in the strh/strf headers to a fake one
    fake = payload.replace(b"MJPG", b"FAKE")
    info = video.probe_avi(fake)
    assert info.codec == "FAKE"
    try:
        video.decode_avi_frames(fake, [0])
        raise AssertionError("expected unsupported codec error")
    except video.VideoError as e:
        assert "unsupported video codec" in str(e)

    seen = []

    def fake_decode(frame_bytes):
        seen.append(len(frame_bytes))
        return np.zeros((16, 16, 3), dtype=np.uint8)

    video.register_frame_decoder("FAKE", fake_decode)
    try:
        frames = video.decode_avi_frames(fake, [0, 2])
        assert len(frames) == 2 and len(seen) == 2
    finally:
        video._FRAME_DECODERS.pop("FAKE", None)
