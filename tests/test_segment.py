"""Clip segmentation with silence-snapped boundaries."""

from __future__ import annotations

import numpy as np

from data_validator_spark.audio import codecs
from data_validator_spark.audio.segment import (
    plan_boundaries,
    segment_clips,
    snap_to_valley,
)


def _tone(sr, dur_s, f=440.0):
    n = int(sr * dur_s)
    return (0.5 * np.sin(2 * np.pi * f * np.arange(n) / sr)).astype(np.float32)


def test_snap_finds_planted_silence():
    sr = 16000
    x = _tone(sr, 3.25)
    a, b = int(1.07 * sr), int(1.22 * sr)
    x[a:b] = 0.0
    pos = snap_to_valley(x, sr, sr, snap_ms=200)
    assert a <= pos <= b - int(0.01 * sr)
    # no window to search -> position unchanged
    assert snap_to_valley(x, sr, sr, snap_ms=0) == sr


def test_plan_boundaries_arithmetic():
    sr = 16000
    x = _tone(sr, 3.25)
    b, dropped = plan_boundaries(x, sr, 1000, snap_ms=0, min_ms=300)
    assert b == [0, sr, 2 * sr, 3 * sr]
    assert dropped == int(0.25 * sr)
    # exact multiple: no drop
    b2, d2 = plan_boundaries(_tone(sr, 3.0), sr, 1000, 0, 300)
    assert len(b2) == 4 and d2 == 0
    # whole clip under min: kept anyway (a 200ms corpus is not all stubs)
    b3, d3 = plan_boundaries(_tone(sr, 0.2), sr, 1000, 0, 300)
    assert b3 == [0, int(0.2 * sr)] and d3 == 0


def test_segment_clips_operator(spark):
    sr = 16000
    rows = [
        ("long", "pcm16", sr, bytearray(codecs.encode("pcm16", _tone(sr, 2.5), sr))),
        ("tiny", "pcm16", sr, bytearray(codecs.encode("pcm16", _tone(sr, 0.4), sr))),
        ("bad", "pcm16", sr, bytearray(b"x")),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, codec string, sr_hz int, bytes binary"
    )
    segs = segment_clips(df, max_ms=1000, min_ms=300).collect()
    by_clip = {}
    for r in segs:
        by_clip.setdefault(r.clip_id, []).append(r)
    longs = sorted(by_clip["long"], key=lambda r: r.seg_idx)
    assert [r.seg_id for r in longs] == ["long:seg0", "long:seg1", "long:seg2"]
    assert longs[0].seg_dur_ms == 1000.0 and longs[2].seg_dur_ms == 500.0
    # segments decode back to the right lengths
    pcm, s2 = codecs.decode("pcm16", longs[1].bytes)
    assert s2 == sr and len(pcm) == sr
    assert len(by_clip["tiny"]) == 1 and by_clip["tiny"][0].seg_dur_ms == 400.0
    assert by_clip["bad"][0].segment_error is not None
    assert by_clip["bad"][0].bytes is None
