"""BS.1770 loudness + reference-alignment diagnostics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_validator_spark.audio import codecs, synth
from data_validator_spark.audio.align import (
    align_report,
    aligned_snr,
    best_lag,
    make_align_udf,
)
from data_validator_spark.audio.loudness import (
    integrated_lufs,
    k_weighting_power,
    loudness_report,
    make_loudness_udf,
)


# ------------------------------------------------------------ loudness


def test_bs1770_sine_anchor():
    """The textbook BS.1770 anchor: a 0 dBFS 997 Hz sine measures
    -3.01 LUFS; amplitude scaling moves it exactly dB-for-dB."""
    t = np.arange(96000)
    x = np.sin(2 * np.pi * 997 * t / 48000)
    lufs, nb, ng = integrated_lufs(x, 48000)
    assert lufs == pytest.approx(-3.01, abs=0.05)
    assert nb == ng == 17
    lufs2, _, _ = integrated_lufs(0.25 * x, 48000)
    assert lufs2 - lufs == pytest.approx(20 * np.log10(0.25), abs=1e-6)


def test_bs1770_anchor_all_sample_rates():
    """The biquads are designed from the analog prototype, so the
    anchor must hold at non-48k rates too (bilinear warping keeps the
    997 Hz response within a tenth of a dB down to 8 kHz)."""
    for fs in (8000, 16000, 22050, 44100):
        x = np.sin(2 * np.pi * 997 * np.arange(2 * fs) / fs)
        assert integrated_lufs(x, fs)[0] == pytest.approx(-3.01, abs=0.1), fs


def test_k_weighting_matches_spec_table_at_48k():
    """At 48 kHz the designed coefficients must reproduce the
    BS.1770-4 tabulated response: +~4 dB high shelf, +0.69 dB at
    997 Hz (the gain the spec's -0.691 constant calibrates away),
    strong low-frequency rejection."""
    n_fft = 4800
    w = k_weighting_power(48000, n_fft // 2 + 1, n_fft)
    hz_per_bin = 48000 / n_fft
    db = lambda k: 10 * np.log10(w[k])  # noqa: E731
    assert db(int(997 / hz_per_bin)) == pytest.approx(0.691, abs=0.05)
    assert db(int(10000 / hz_per_bin)) == pytest.approx(4.0, abs=0.3)
    assert db(int(25 / hz_per_bin)) < -12.0


def test_gating_ignores_silence_tail():
    """1 s of tone + 3 s of near-silence: the relative gate must drop
    the silent blocks, keeping integrated loudness near the tone's own
    level instead of averaging in the silence."""
    fs = 48000
    loud = 0.5 * np.sin(2 * np.pi * 997 * np.arange(fs) / fs)
    tail = 1e-4 * np.sin(2 * np.pi * 997 * np.arange(3 * fs) / fs)
    lufs, _, ng = integrated_lufs(np.concatenate([loud, tail]), fs)
    solo = integrated_lufs(loud, fs)[0]
    assert abs(lufs - solo) < 1.0  # not ~-15 (ungated mean)
    assert ng < 17


def test_loudness_edge_cases():
    assert np.isnan(integrated_lufs(np.zeros(96000), 48000)[0])  # silence
    assert integrated_lufs(np.zeros(1000), 48000) == (
        pytest.approx(float("nan"), nan_ok=True), 0, 0,
    )  # sub-block clip


def test_loudness_report_labels(spark):
    rows = []
    for cid, amp in (("ok", 0.3), ("quiet", 0.001), ("silent", 0.0)):
        pcm = amp * synth.reference_pcm(cid, 16000, 16000)
        rows.append((cid, "pcm16", bytearray(codecs.encode("pcm16", pcm, 16000))))
    df = spark.createDataFrame(rows, "clip_id string, codec string, bytes binary")
    out = {
        r.clip_id: r
        for r in loudness_report(df, lufs_min=-30, lufs_max=-6).collect()
    }
    assert out["ok"]._loudness_label is None
    assert out["quiet"]._loudness_label.startswith(
        "audio_loudness_out_of_range("
    )
    assert out["silent"]._loudness_label == "audio_loudness_unmeasurable"
    assert out["ok"].loudness_n_gated_blocks > 0


def test_loudness_udf_plugin_seam(spark):
    """make_loudness_udf(plugins) must route through the registered
    decoder exactly like checks.make_audio_check_udf."""
    calls = []

    def fake_decode(payload):
        calls.append(1)
        pcm = np.frombuffer(bytes(payload), dtype=np.float32)
        return pcm, 16000

    pcm = 0.3 * synth.reference_pcm("p", 16000, 16000)
    df = spark.createDataFrame(
        [("p", "fakecodec", bytearray(pcm.astype(np.float32).tobytes()))],
        "clip_id string, codec string, bytes binary",
    )
    out = loudness_report(df, plugins={"fakecodec": fake_decode}).collect()[0]
    assert out.loudness_decode_error is None
    assert -30 < out.loudness_lufs < -6


# ------------------------------------------------------------ alignment


def test_best_lag_exact_and_deterministic():
    sr, n = 16000, 8000
    ref = synth.reference_pcm("lag", sr, n + 1600)
    assert best_lag(ref[:n], ref, 1600) == 0
    assert best_lag(ref[320 : 320 + n], ref, 1600) == 320
    led = np.concatenate([np.zeros(200, np.float32), ref[: n - 200]])
    assert best_lag(led, ref, 1600) == -200


def test_aligned_snr_recovers_shift():
    sr, n = 16000, 8000
    ref = synth.reference_pcm("snr", sr, n + 1600)
    x = ref[480 : 480 + n]
    assert codecs.snr_db(ref[:n], x) < 10
    assert aligned_snr(x, ref, 480) > 60


def test_align_report_labels(spark):
    sr, n = 16000, 8000
    rows = []
    for cid, kind in (("a", "aligned"), ("b", "drop"), ("c", "other")):
        ref = synth.reference_pcm(cid, sr, n + sr // 10)
        if kind == "aligned":
            pcm = ref[:n]
        elif kind == "drop":
            pcm = ref[320 : 320 + n]
        else:
            pcm = synth.reference_pcm(cid + "!", sr, n)
        rows.append(
            (cid, "pcm16", bytearray(codecs.encode("pcm16", np.clip(pcm, -1, 1), sr)))
        )
    df = spark.createDataFrame(rows, "clip_id string, codec string, bytes binary")
    out = {r.clip_id: r for r in align_report(df).collect()}
    assert out["a"]._align_label is None and out["a"].lag_samples == 0
    assert out["b"]._align_label.startswith("audio_misaligned(lag=320,")
    assert out["b"].aligned_snr_db > 30 > out["b"].raw_snr_db
    assert out["c"]._align_label.startswith("audio_content_mismatch(")


def test_align_udf_plugin_seam(spark):
    def fake_decode(payload):
        return np.frombuffer(bytes(payload), dtype=np.float32), 16000

    ref = synth.reference_pcm("pp", 16000, 9600)
    df = spark.createDataFrame(
        [("pp", "fakecodec", bytearray(ref[:8000].astype(np.float32).tobytes()))],
        "clip_id string, codec string, bytes binary",
    )
    udf_ctor_covered = make_align_udf(max_lag_ms=50, plugins={"fakecodec": fake_decode})
    assert udf_ctor_covered is not None
    out = align_report(
        df, max_lag_ms=50, plugins={"fakecodec": fake_decode}
    ).collect()[0]
    assert out._align_label is None and out.lag_samples == 0
