"""Deterministic distributed generator for the `clips` input table
(shape fixed by BASELINE.json input_hint) + companion fixtures:

  clips(clip_id string, bytes binary, sr_hz int, dur_ms int,
        codec string, transcript string, ingest_date date,
        ingest_seq long)
  transcripts_ref(clip_id, transcript, updated_at, is_complete)
  golden(ingest_seq, clip_id, inj_* boolean flags)   -- pytest oracle

Generation is a pure function of (row index, seed): every random draw
comes from a splitmix64 hash of (seed, index, salt). That makes the
generator embarrassingly parallel (mapInPandas over spark.range — the
same recipe would synthesize the 10^12-row table on a cluster) and
makes the reference PCM/transcript recomputable inside the decode
check (audio/synth.py).

Injected violations mirror FIXTURES.md §1 and the reference's rule
catalog translated to audio (SURVEY.md §2.9).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from data_validator_spark.audio import codecs, synth

_SR_CHOICES = np.array([16000, 44100, 48000, 22050, 8000])
_SR_PROBS = np.array([0.55, 0.20, 0.12, 0.08, 0.05])
_SR_INVALID = np.array([0, -1, 11025])
_CODEC_CHOICES = np.array(["pcm16", "flac", "mulaw", "opus"])
_CODEC_PROBS = np.array([0.50, 0.25, 0.15, 0.10])
_EPOCH = dt.date(2026, 1, 1)

_PHI = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _u01(idx: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Vectorized splitmix64 -> uniform [0,1) per row, stream per salt."""
    with np.errstate(over="ignore"):
        z = (idx.astype(np.uint64) + np.uint64(seed)) * _PHI + np.uint64(salt) * _M2
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)


@dataclass(frozen=True)
class ClipsConfig:
    n_rows: int = 10_000
    n_partitions: int = 8  # distinct ingest_date values
    seed: int = 42
    max_synth_ms: int = 1500  # cap actual synthesized audio length
    # violation rates (disjoint channel A: payload/identity injections)
    p_dup: float = 0.005
    p_bytes_null: float = 0.002
    p_codec_null: float = 0.001
    p_codec_unknown: float = 0.002
    p_corrupt: float = 0.003
    p_low_snr: float = 0.003
    p_transcript_empty: float = 0.010
    p_transcript_mismatch: float = 0.003
    # independent channels
    p_sr_invalid: float = 0.005
    p_dur_low: float = 0.010
    p_dur_high: float = 0.010
    p_dur_null: float = 0.003
    p_dur_warn: float = 0.005  # 35-55s: warning band, valid but flagged
    p_ref_missing: float = 0.005  # clip omitted from transcripts_ref
    p_ref_extra: float = 0.005  # orphan transcript rows
    p_ref_dup: float = 0.006  # duplicate transcript rows per clip
    # drift knobs (baseline snapshot uses shifted values)
    dur_log_mean: float = 8.0  # exp(8.0) ~ 2981 ms
    dur_log_sigma: float = 0.4
    codec_probs: tuple[float, ...] = tuple(_CODEC_PROBS)
    clip_id_prefix: str = "clip"

    def channel_a_bounds(self) -> list[tuple[str, float, float]]:
        """Disjoint [lo, hi) intervals on one uniform draw."""
        names = [
            "dup",
            "bytes_null",
            "codec_null",
            "codec_unknown",
            "corrupt",
            "low_snr",
            "transcript_empty",
            "transcript_mismatch",
        ]
        rates = [
            self.p_dup,
            self.p_bytes_null,
            self.p_codec_null,
            self.p_codec_unknown,
            self.p_corrupt,
            self.p_low_snr,
            self.p_transcript_empty,
            self.p_transcript_mismatch,
        ]
        out, lo = [], 0.0
        for n, r in zip(names, rates):
            out.append((n, lo, lo + r))
            lo += r
        assert lo < 1.0
        return out


def _pick(u: np.ndarray, choices: np.ndarray, probs: np.ndarray) -> np.ndarray:
    cdf = np.cumsum(np.asarray(probs, dtype=np.float64))
    cdf = cdf / cdf[-1]
    return choices[np.searchsorted(cdf, u, side="right").clip(0, len(choices) - 1)]


def meta_batch(idx: np.ndarray, cfg: ClipsConfig) -> pd.DataFrame:
    """Metadata (everything except `bytes`) for the given row indices.

    Pure numpy; also returns the inj_* golden flag columns.
    """
    n = len(idx)
    seed = cfg.seed
    ua = _u01(idx, seed, 1)
    flags = {}
    for name, lo, hi in cfg.channel_a_bounds():
        flags["inj_" + name] = (ua >= lo) & (ua < hi)

    # identity
    base_ids = np.array([f"{cfg.clip_id_prefix}-{i:012d}" for i in idx])
    clip_id = base_ids.copy()
    dup = flags["inj_dup"] & (idx > 0)
    if dup.any():
        back = (_u01(idx[dup], seed, 2) * np.minimum(idx[dup], 1000)).astype(np.int64) + 1
        src = idx[dup] - back
        # a source row that is itself dup-injected carries a different
        # clip_id than its base id — drop those injections so every
        # inj_dup row is a true second occurrence
        dup_lo, dup_hi = cfg.channel_a_bounds()[0][1:]
        u_src = _u01(src, seed, 1)
        src_is_dup = (u_src >= dup_lo) & (u_src < dup_hi) & (src > 0)
        keep = ~src_is_dup
        dup_idx = np.flatnonzero(dup)
        dup[dup_idx[~keep]] = False
        clip_id[dup_idx[keep]] = np.array(
            [f"{cfg.clip_id_prefix}-{i:012d}" for i in src[keep]]
        )
    flags["inj_dup"] = dup

    # sr_hz
    sr = _pick(_u01(idx, seed, 3), _SR_CHOICES, _SR_PROBS).astype(np.int64)
    inj_sr = _u01(idx, seed, 4) < cfg.p_sr_invalid
    sr[inj_sr] = _pick(_u01(idx[inj_sr], seed, 5), _SR_INVALID, np.ones(3))
    flags["inj_sr_invalid"] = inj_sr

    # codec
    codec = _pick(
        _u01(idx, seed, 6), _CODEC_CHOICES, np.asarray(cfg.codec_probs)
    ).astype(object)
    codec[flags["inj_codec_unknown"]] = "amr"
    codec[flags["inj_codec_null"]] = None

    # opus has no PCM decode tier (metadata-only — audio/opus.py), so
    # a low-SNR plant would be undetectable there; the same injection
    # draw materializes instead as a REAL container defect (granule
    # position inconsistent with the TOC frame sum -> hard
    # audio_decode_failed), keeping every channel-A row a true plant
    is_opus = np.array([c == "opus" for c in codec])
    flags["inj_opus_meta"] = flags["inj_low_snr"] & is_opus
    flags["inj_low_snr"] = flags["inj_low_snr"] & ~is_opus

    # dur_ms: lognormal via inverse-normal approximation of a uniform
    u_d = _u01(idx, seed, 7)
    z = np.sqrt(2.0) * _erfinv(2.0 * u_d.clip(1e-9, 1 - 1e-9) - 1.0)
    dur = np.exp(cfg.dur_log_mean + cfg.dur_log_sigma * z)
    dur = dur.astype(np.float64)
    u_dv = _u01(idx, seed, 8)
    inj_dur_low = u_dv < cfg.p_dur_low
    inj_dur_high = (u_dv >= cfg.p_dur_low) & (u_dv < cfg.p_dur_low + cfg.p_dur_high)
    lo2 = cfg.p_dur_low + cfg.p_dur_high
    inj_dur_null = (u_dv >= lo2) & (u_dv < lo2 + cfg.p_dur_null)
    lo3 = lo2 + cfg.p_dur_null
    inj_dur_warn = (u_dv >= lo3) & (u_dv < lo3 + cfg.p_dur_warn)
    dur[inj_dur_low] = 10 + (_u01(idx[inj_dur_low], seed, 9) * 80)  # 10..90 ms
    dur[inj_dur_high] = 75_000 + (_u01(idx[inj_dur_high], seed, 10) * 50_000)
    dur[inj_dur_warn] = 35_000 + (_u01(idx[inj_dur_warn], seed, 24) * 20_000)
    dur_ms = pd.array(np.round(dur).astype(np.int64), dtype="Int64")
    dur_ms[inj_dur_null] = pd.NA
    flags["inj_dur_low"] = inj_dur_low
    flags["inj_dur_high"] = inj_dur_high
    flags["inj_dur_null"] = inj_dur_null
    flags["inj_dur_warn"] = inj_dur_warn

    # transcript (truth is a function of clip_id; empties/mismatches injected)
    transcript = np.array([synth.reference_transcript(c) for c in clip_id], dtype=object)
    transcript[flags["inj_transcript_mismatch"]] = [
        t + " zz-mismatch" for t in transcript[flags["inj_transcript_mismatch"]]
    ]
    empty_kind = _u01(idx, seed, 11) < 0.5
    te = flags["inj_transcript_empty"]
    transcript[te & empty_kind] = None
    transcript[te & ~empty_kind] = ""

    # referential omission (clip present, transcripts_ref row missing)
    flags["inj_ref_missing"] = _u01(idx, seed, 12) < cfg.p_ref_missing

    part = (idx * cfg.n_partitions // max(cfg.n_rows, 1)).astype(np.int64)
    ingest_date = np.array([_EPOCH + dt.timedelta(days=int(p)) for p in part])

    out = pd.DataFrame(
        {
            "ingest_seq": idx.astype(np.int64),
            "clip_id": clip_id,
            "sr_hz": pd.array(sr, dtype="Int32"),
            "dur_ms": dur_ms.astype("Int32"),
            "codec": codec,
            "transcript": transcript,
            "ingest_date": ingest_date,
        }
    )
    for k, v in flags.items():
        out[k] = v
    return out


def _erfinv(x: np.ndarray) -> np.ndarray:
    """Vectorized inverse error function (Winitzki approximation, ~1e-3
    relative accuracy — plenty for generating a lognormal-ish shape)."""
    a = 0.147
    ln1mx2 = np.log1p(-x * x)
    term = 2.0 / (np.pi * a) + ln1mx2 / 2.0
    return np.sign(x) * np.sqrt(np.sqrt(term**2 - ln1mx2 / a) - term)


def _synth_bytes(
    cfg: ClipsConfig,
    inj_bytes_null: bool,
    codec,
    sr_hz,
    dur_ms,
    clip_id: str,
    inj_low_snr: bool,
    inj_corrupt: bool,
    inj_opus_meta: bool,
) -> bytes | None:
    if inj_bytes_null:
        return None
    enc_codec = codec if codec in codecs.SUPPORTED_CODECS else "pcm16"
    sr = int(sr_hz) if int(sr_hz or 0) > 0 else 8000
    dur = int(dur_ms) if pd.notna(dur_ms) else 3000
    n_samples = max(1, int(round(min(dur, cfg.max_synth_ms) / 1000.0 * sr)))
    if inj_opus_meta:
        # real Ogg-Opus container whose final granule overstates the
        # TOC frame sum by 400ms -> the metadata tier's cross-check
        # rejects it (audio/opus.py inspect)
        from data_validator_spark.audio import opus as _opus

        return _opus.encode_ogg_opus(
            n_samples, sr, seed=synth.clip_seed(clip_id),
            granule_skew_ms=400.0,
        )
    src_id = clip_id + "#alt" if inj_low_snr else clip_id
    pcm = synth.reference_pcm(src_id, sr, n_samples)
    payload = codecs.encode(enc_codec, pcm, sr)
    if inj_corrupt:
        payload = payload[: max(8, len(payload) // 2)]
    return payload


_SYNTH_COLS = [
    "inj_bytes_null",
    "codec",
    "sr_hz",
    "dur_ms",
    "clip_id",
    "inj_low_snr",
    "inj_corrupt",
    "inj_opus_meta",
]


CLIPS_COLUMNS = [
    "clip_id",
    "bytes",
    "sr_hz",
    "dur_ms",
    "codec",
    "transcript",
    "ingest_date",
    "ingest_seq",
]
GOLDEN_FLAGS = [
    "inj_dup",
    "inj_bytes_null",
    "inj_codec_null",
    "inj_codec_unknown",
    "inj_corrupt",
    "inj_low_snr",
    "inj_opus_meta",
    "inj_transcript_empty",
    "inj_transcript_mismatch",
    "inj_sr_invalid",
    "inj_dur_low",
    "inj_dur_high",
    "inj_dur_null",
    "inj_dur_warn",
    "inj_ref_missing",
]

_CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, ingest_date date, ingest_seq long"
)
_GOLDEN_SCHEMA = "ingest_seq long, clip_id string, " + ", ".join(
    f"{f} boolean" for f in GOLDEN_FLAGS
)


def generate_clips(spark: SparkSession, cfg: ClipsConfig) -> DataFrame:
    """Distributed clips table: spark.range -> mapInPandas(synthesize)."""

    def gen(batches):
        for pdf in batches:
            meta = meta_batch(pdf["id"].to_numpy(), cfg)
            # zip over plain arrays: ~3x faster than iterrows for the
            # per-row encode loop (loop overhead matters at fixture
            # sizes used by the scaling bench)
            meta["bytes"] = [
                _synth_bytes(cfg, *vals)
                for vals in zip(*[meta[c].tolist() for c in _SYNTH_COLS])
            ]
            yield meta[CLIPS_COLUMNS]

    n_tasks = max(2, min(64, cfg.n_rows // 2500 or 2))
    return (
        spark.range(0, cfg.n_rows, numPartitions=n_tasks)
        .mapInPandas(gen, schema=_CLIPS_SCHEMA)
    )


def generate_golden(spark: SparkSession, cfg: ClipsConfig) -> DataFrame:
    """Golden injected-violation flags (metadata pass only, no audio)."""

    def gen(batches):
        for pdf in batches:
            meta = meta_batch(pdf["id"].to_numpy(), cfg)
            yield meta[["ingest_seq", "clip_id"] + GOLDEN_FLAGS]

    return spark.range(0, cfg.n_rows, numPartitions=4).mapInPandas(
        gen, schema=_GOLDEN_SCHEMA
    )


def generate_transcripts_ref(spark: SparkSession, cfg: ClipsConfig) -> DataFrame:
    """Reference-side transcript table (the referential pair of the
    clip<->transcript relationship, SURVEY.md §1.4).

    Includes winner-selection material: ~p_ref_dup of clips get 2-3
    rows with differing updated_at / is_complete covering all three
    dedup branches (1 complete / >=2 complete / 0 complete) —
    reference: shared/firestore_services.py:293-357.
    """

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            base = np.array([f"{cfg.clip_id_prefix}-{i:012d}" for i in idx])
            keep = ~(_u01(idx, cfg.seed, 12) < cfg.p_ref_missing)
            u_dup = _u01(idx, cfg.seed, 20)
            n_copies = np.where(
                keep & (u_dup < cfg.p_ref_dup / 2),
                3,
                np.where(keep & (u_dup < cfg.p_ref_dup), 2, keep.astype(int)),
            )
            extra = _u01(idx, cfg.seed, 21) < cfg.p_ref_extra
            rows = []
            for i, cid, k, ex in zip(idx, base, n_copies, extra):
                truth = synth.reference_transcript(cid)
                branch = int(_u01(np.array([i]), cfg.seed, 22)[0] * 3)
                for c in range(int(k)):
                    ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
                        minutes=int(i) % 100_000, seconds=17 * c
                    )
                    if k == 1:
                        complete = True
                    elif branch == 0:  # exactly one completed -> winner
                        complete = c == 0
                    elif branch == 1:  # >=2 completed -> no winner
                        complete = c < 2
                    else:  # none completed -> latest wins
                        complete = False
                    rows.append((cid, truth, ts, complete))
                if ex:
                    rows.append(
                        (
                            f"{cfg.clip_id_prefix}-x{int(i):011d}",
                            synth.reference_transcript(f"{cfg.clip_id_prefix}-x{int(i):011d}"),
                            dt.datetime(2026, 1, 2, tzinfo=dt.timezone.utc),
                            True,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["clip_id", "transcript", "updated_at", "is_complete"]
            )

    return spark.range(0, cfg.n_rows, numPartitions=4).mapInPandas(
        gen,
        schema="clip_id string, transcript string, updated_at timestamp, is_complete boolean",
    )


def write_fixture(spark: SparkSession, cfg: ClipsConfig, out_dir: str) -> dict[str, str]:
    """Materialize clips (partitioned by ingest_date), transcripts_ref,
    and golden as parquet under out_dir; returns table -> path."""
    paths = {
        "clips": f"{out_dir}/clips",
        "transcripts_ref": f"{out_dir}/transcripts_ref",
        "golden": f"{out_dir}/golden",
    }
    generate_clips(spark, cfg).write.mode("overwrite").partitionBy(
        "ingest_date"
    ).parquet(paths["clips"])
    generate_transcripts_ref(spark, cfg).write.mode("overwrite").parquet(
        paths["transcripts_ref"]
    )
    generate_golden(spark, cfg).write.mode("overwrite").parquet(paths["golden"])
    return paths
