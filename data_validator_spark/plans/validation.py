"""The end-to-end clips validation plan.

Composes the engine's operators into the reference's lifecycle
(SURVEY.md §3.4): hard schema tier -> soft/warning metadata rules ->
uniqueness -> transcript winner-dedup + referential + equality ->
audio payload checks -> per-partition verdicts + column stats + drift.

Everything is lazy DataFrames; the caller (or the manifest runner)
decides what to materialize. Stage order matters for cost at scale:
rows failing metadata hard rules (missing/unknown codec, missing id)
are diverted BEFORE the audio stage so no Python time is spent on
undecodable rows; the payload itself is read exactly once (scan-side
decode; missing-payload detection happens there too) and is never
shuffled — see run_validation's docstring.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validator_spark.audio.checks import run_audio_checks
from data_validator_spark.operators import dedup, drift, referential, stats
from data_validator_spark.rules import clip_rules
from data_validator_spark.rules.compiler import append_messages, apply_rules, split_hard

ENTITY = "clip"


def _bytes_missing_cols() -> list:
    """Normalized error columns for the bytes_missing hard violation
    (mirrors required('bytes') from clip_hard_rules; the label and
    echoed value match hard_violations' output for that rule)."""
    return [
        F.lit(ENTITY).alias("entity"),
        F.lit("bytes_missing").alias("rule"),
        F.lit("bytes").alias("invalid_key"),
        F.lit("null").alias("invalid_value"),
        F.lit("audio payload").alias("expected_value"),
    ]


@dataclass(frozen=True)
class ValidationConfig:
    partition_col: str = "ingest_date"
    order_col: str = "ingest_seq"  # deterministic first-wins ordering
    check_audio: bool = True
    # opt-in: compute the audio QUALITY features + soft labels
    # (clipping / DC offset / silence — audio/quality.py) in the SAME
    # decode pass as the SNR invariant; adds the feature columns to
    # the validated output and folds quality labels into messages
    check_quality: bool = False
    # quality-tier policy knobs (only consulted when check_quality):
    # bandwidth below this fraction of the container Nyquist flags
    # audio_upsampled; effective bit depth below this flags
    # audio_low_bitdepth. None disables each rule (the defaults —
    # both are dataset policies, not universal thresholds).
    quality_upsample_min_ratio: float | None = None
    quality_min_effective_bits: int | None = None
    # integrated-loudness window (BS.1770 LUFS, audio/loudness.py via
    # the fused quality pass); both set -> out-of-window clips get the
    # audio_loudness_out_of_range soft label. None disables (default).
    quality_lufs_min: float | None = None
    quality_lufs_max: float | None = None
    # opt-in: emit the log-mel content embedding (audio/features.py,
    # 2*n floats) from the SAME fused decode — validate + content-
    # dedup in one payload pass. None disables (default).
    quality_embed_mels: int | None = None
    # opt-in: transcript <-> audio plausibility rules (operators/
    # plausibility.py): words-per-second window over the DECODED
    # duration (falls back to dur_ms when audio checks are off), and —
    # when check_quality also computed silence_ratio — the
    # speech-share-vs-transcript-length rule. Pure Column algebra over
    # scalars the single decode pass already produced.
    check_plausibility: bool = False
    wps_min: float = 0.5
    wps_max: float = 6.0
    speech_share_min: float = 0.3
    snr_min_db: float = 30.0
    decode_partitions: int | None = None  # repartition before decode stage
    # co-batch the decode stage by this LOW-CARDINALITY key (e.g.
    # "codec": same-codec Arrow batches keep the decode branch
    # predictable) instead of the uniform (clip_id, order_col) hash.
    # Only consulted when decode_partitions is set. A hot key value
    # (one codec owning most of the corpus — the north star's skewed
    # codec/sr_hz case) would turn this into a straggler, so the plan
    # consults skew.skew_report first and salts the repartition ONLY
    # when the advisory fires (auto_salt_decode below).
    decode_partition_key: str | None = None
    auto_salt_decode: bool = True
    salt_imbalance_max: float = 10.0  # advisory threshold (max/mean)
    decode_salt_n: int = 16
    # persist the post-audio row set (bytes already dropped) so the
    # fan-out actions (verdict rollup, violation write, stats) do not
    # re-run the decode stage once per action. Never caches `bytes`.
    persist: bool = False
    rule_version: str = clip_rules.RULE_VERSION
    # full profile (null rate / min-max / HLL / quantiles) over these:
    stats_specs: tuple[stats.ColumnSpec, ...] = (
        stats.ColumnSpec("dur_ms", "numeric", 0.0, 10_000.0, 50),
        stats.ColumnSpec("sr_hz", "categorical"),
        stats.ColumnSpec("codec", "categorical"),
        stats.ColumnSpec("transcript", "categorical"),
        stats.ColumnSpec("clip_id", "categorical"),
    )
    # drift histograms only over bounded-cardinality columns (a
    # histogram over clip_id/transcript would shuffle the keyspace):
    hist_specs: tuple[stats.ColumnSpec, ...] = (
        stats.ColumnSpec("dur_ms", "numeric", 0.0, 10_000.0, 50),
        stats.ColumnSpec("sr_hz", "categorical"),
        stats.ColumnSpec("codec", "categorical"),
    )


@dataclass
class ValidationResult:
    validated: DataFrame  # all soft-tier rows incl. flags/messages
    invalid: DataFrame  # hard side-channel (normalized error rows)
    partition_verdicts: DataFrame
    summary_stats: DataFrame
    histograms: DataFrame
    drift: DataFrame | None = None
    ref_winners: DataFrame | None = None
    # transcript-side referential integrity: reference rows whose
    # clip_id matches no clip (the other direction of the clip <->
    # transcript pair; the fixture injects these via p_ref_extra)
    orphan_transcripts: DataFrame | None = None
    # set by manifest.run_resumable: the (verdict + fingerprint) rows to
    # append to the checkpoint manifest — callers that write outputs
    # themselves record these LAST, so a crash can never mark a
    # partition done before its outputs landed
    manifest_rows: DataFrame | None = None
    # the exact DataFrames persist() was called on (cfg.persist=True);
    # unpersisting `validated` (a child plan) would be a silent no-op
    persisted: list[DataFrame] = field(default_factory=list)

    def unpersist(self) -> None:
        for df in self.persisted:
            df.unpersist()


def _ref_winner_transcripts(transcripts_ref: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Winner-selection over the reference transcript table.

    Returns (winners, ambiguous):
      winners   — one authoritative (clip_id, transcript) per clip
      ambiguous — clip_ids whose group hit the >=2-completed branch
                  (no winner exists; clips referencing them inherit
                  `multiple_completed_transcripts`, the J6
                  message-inheritance join of SURVEY.md §2.3)
    """
    w = dedup.winner_selection(
        transcripts_ref,
        keys=["clip_id"],
        complete_col="is_complete",
        time_col="updated_at",
        id_col="clip_id",
        suffixed_col="clip_id",  # losers get clip_id:dupN -> drop out of join
    )
    winners = w.filter(F.col("is_winner")).select(
        F.col("clip_id"), F.col("transcript").alias("_ref_transcript")
    )
    ambiguous = (
        w.filter(F.col("dedup_msg") == "multiple_completed_transcripts")
        # recover the base id: strip the ':dupN' suffix added above
        .select(F.regexp_replace("clip_id", r":dup\d+$", "").alias("clip_id"))
        .dropDuplicates(["clip_id"])
    )
    return winners, ambiguous


def run_validation(
    clips: DataFrame,
    transcripts_ref: DataFrame | None = None,
    baseline_hist: DataFrame | None = None,
    cfg: ValidationConfig = ValidationConfig(),
) -> ValidationResult:
    """Payload-aware dataflow (the part that matters at 10^12 rows):

    The `bytes` column is read in exactly ONE map-only stage — scan ->
    hard filter -> minimal projection -> Arrow decode UDF -> small
    result columns — fused into the file scan, so the payload is NEVER
    shuffled. All cross-row machinery (dedup windows, winner-selection,
    referential joins) runs on a bytes-free projection and equi-joins
    the small audio results back on (clip_id, order_col). Before this
    split, the payload rode through every window/join shuffle
    (~4x full-table payload shuffles), which capped scaling.

    Input contract: (clip_id, order_col) must uniquely identify a row
    of `clips` — order_col is the deterministic dedup ordering AND the
    equi-join key attaching the audio results back to the bytes-free
    metadata branch, so duplicate (clip_id, order_col) pairs would
    cross-multiply that join. The fixture generator guarantees it
    (ingest_seq is a global row index); external job.py inputs must
    provide an equivalent ingestion sequence/rowid.
    """
    rules = clip_rules.all_clip_rules()
    id_cols = ["clip_id", cfg.order_col, cfg.partition_col]
    _persisted: list[DataFrame] = []
    nonbytes = [r for r in rules if r.invalid_key != "bytes"]

    audio_res = None
    if cfg.check_audio:
        # ---- tier 1a: non-payload hard failures -> side-channel, from
        # a column-pruned scan that never touches `bytes`
        from data_validator_spark.rules.compiler import hard_predicate

        _, invalid = split_hard(clips.drop("bytes"), nonbytes, ENTITY, id_cols)

        # ---- scan-side decode: the ONLY read of `bytes` in the run —
        # scan -> minimal projection -> Arrow UDF -> small result
        # columns, fused into the file scan. ALL rows ride this one
        # scan; rows already diverted by a non-bytes hard rule carry
        # _skip_decode=true so the UDF spends no Python time on them,
        # but their payload null-mask is still observed JVM-side
        # (audio_bytes_null) — that is how a diverted row with a null
        # payload still earns its bytes_missing violation (side-channel
        # contract: one row per failed hard rule) without a second
        # payload scan.
        audio_in = clips.select(
            "clip_id",
            cfg.order_col,
            cfg.partition_col,
            "codec",
            "sr_hz",
            "bytes",
            hard_predicate(nonbytes).alias("_skip_decode"),
        )
        if cfg.decode_partitions:
            # optional: decouple decode parallelism from file layout
            # (shuffles the projected payload — only worth it when file
            # splits are pathologically few/skewed)
            if cfg.decode_partition_key:
                # co-batched decode keyed on a low-cardinality column;
                # the skew advisory (operators/skew.skew_report — one
                # bytes-free hash aggregate, one driver-side row)
                # decides whether the hot-key salt is NEEDED, so the
                # uniform case pays no salt and the Zipf case never
                # stragglers
                from data_validator_spark.operators import skew as _skew

                key = cfg.decode_partition_key
                do_salt = False
                if cfg.auto_salt_decode:
                    rep = _skew.skew_report(
                        clips.select(key),
                        key,
                        imbalance_max=cfg.salt_imbalance_max,
                    ).collect()[0]
                    do_salt = bool(rep["salt_recommended"])
                if do_salt:
                    audio_in = _skew.add_salt(
                        audio_in,
                        ["clip_id", cfg.order_col],
                        cfg.decode_salt_n,
                    )
                    audio_in = audio_in.repartition(
                        cfg.decode_partitions, key, "_salt"
                    ).drop("_salt")
                else:
                    audio_in = audio_in.repartition(
                        cfg.decode_partitions, key
                    )
            else:
                audio_in = audio_in.repartition(
                    cfg.decode_partitions, "clip_id", cfg.order_col
                )
        audio_res = run_audio_checks(
            audio_in,
            snr_min=cfg.snr_min_db,
            skip_col="_skip_decode",
            quality=cfg.check_quality,
            upsample_min_ratio=cfg.quality_upsample_min_ratio,
            min_effective_bits=cfg.quality_min_effective_bits,
            lufs_min=cfg.quality_lufs_min,
            lufs_max=cfg.quality_lufs_max,
            embed_mels=cfg.quality_embed_mels,
        ).drop("codec", "sr_hz", "bytes")
        if cfg.persist:
            audio_res = audio_res.persist()
            _persisted.append(audio_res)

        # ---- tier 1b: bytes_missing, recovered from the decode stage
        # via the structured audio_bytes_null flag (never by matching
        # the CodecError message text); covers diverted rows too
        bytes_missing = audio_res.filter(F.col("audio_bytes_null")).select(
            *id_cols, *_bytes_missing_cols()
        )
        invalid = invalid.unionByName(bytes_missing)

        # bytes-free metadata branch joins the small audio results;
        # the join is inner on the unique (clip_id, order_col) key —
        # see the input contract in the docstring. Diverted rows drop
        # out on the meta side; null-payload rows are dropped here.
        meta = clips.drop("bytes").filter(~hard_predicate(nonbytes))
        v = meta.join(
            audio_res.drop(cfg.partition_col, "_skip_decode"),
            ["clip_id", cfg.order_col],
            "inner",
        )
        v = v.filter(~F.col("audio_bytes_null"))
    else:
        ok, invalid = split_hard(clips, rules, ENTITY, id_cols)
        v = ok

    # ---- tier 2: soft/warning metadata rules (pure Column exprs)
    v = apply_rules(v, rules, ENTITY)

    # ---- uniqueness on clip_id (first occurrence wins, A3/A4)
    v = dedup.flag_duplicates(v, ["clip_id"], cfg.order_col)
    v = append_messages(v, ENTITY, F.col("_dup_label")).drop("_dup_label")

    ref_winners = None
    orphan_transcripts = None
    if transcripts_ref is not None:
        # transcript-side referential integrity (J3's other direction):
        # reference rows pointing at no clip, from a bytes-free
        # clip-id projection (raw transcripts_ref rows carry base ids;
        # :dupN suffixing only happens inside winner_selection)
        clip_ids = clips.select("clip_id").dropDuplicates(["clip_id"])
        orphan_transcripts = transcripts_ref.join(
            clip_ids, "clip_id", "left_anti"
        )
        ref_winners, ambiguous = _ref_winner_transcripts(transcripts_ref)
        # inherited dedup message (J6): clip references a transcript
        # group with >=2 completed rows -> no authoritative transcript
        ambiguous = ambiguous.withColumn("_ref_multi", F.lit(True))
        v = v.join(ambiguous, "clip_id", "left")
        v = append_messages(
            v,
            ENTITY,
            F.when(F.col("_ref_multi"), F.lit("multiple_completed_transcripts")),
        )
        # referential: clip must have a transcript-side row (J3 anti-join form)
        v = referential.flag_missing_ref(
            v, ref_winners, "clip_id", "transcript_ref_missing"
        )
        v = append_messages(
            v,
            ENTITY,
            F.when(F.col("_ref_multi").isNull(), F.col("_ref_label")),
        ).drop("_ref_label", "_ref_multi")
        # transcript equality vs the winning reference row
        v = v.join(ref_winners, "clip_id", "left")
        mismatch = F.when(
            F.col("_ref_transcript").isNotNull()
            & F.col("transcript").isNotNull()
            & (F.trim("transcript") != "")
            & (F.col("transcript") != F.col("_ref_transcript")),
            F.lit("transcript_mismatch"),
        )
        v = append_messages(v, ENTITY, mismatch).drop("_ref_transcript")

    # ---- tier 3: audio-invariant outcomes (results precomputed in the
    # scan-side decode stage; only small columns are handled here)
    if cfg.check_audio:
        # decode failure is a hard-tier outcome discovered late: divert.
        # Sourced from audio_res (not v) so a decode-failed row's
        # violation survives even though dedup/ref joins ran on v.
        decode_invalid = audio_res.filter(
            F.col("audio_decode_error").isNotNull() & ~F.col("audio_bytes_null")
        ).select(
            *id_cols,
            F.lit(ENTITY).alias("entity"),
            F.lit("audio_decode_failed").alias("rule"),
            F.lit("bytes").alias("invalid_key"),
            F.col("audio_decode_error").alias("invalid_value"),
            F.lit("decodable audio payload").alias("expected_value"),
        )
        invalid = invalid.unionByName(decode_invalid)
        v = v.filter(F.col("audio_decode_error").isNull())
        v = append_messages(v, ENTITY, F.col("_snr_label")).drop("_snr_label")
        v = append_messages(
            v, ENTITY, F.col("_container_sr_label"), warning=True
        ).drop("_container_sr_label")
        # metadata-tier codecs (opus): container checks were REAL and
        # passed, but the SNR invariant could not be evaluated — an
        # honest warning, never a synthetic pass (and never a hard
        # fail: the clip may be perfectly fine)
        v = append_messages(
            v, ENTITY, F.col("_pcm_unsupported_label"), warning=True
        ).drop("_pcm_unsupported_label")
        if cfg.check_quality:
            v = append_messages(v, ENTITY, F.col("_quality_labels")).drop(
                "_quality_labels"
            )
    if cfg.check_plausibility:
        from data_validator_spark.operators.plausibility import (
            transcript_plausibility,
        )

        with_quality = cfg.check_audio and cfg.check_quality
        v = transcript_plausibility(
            v,
            "transcript",
            dur_ms_col="dur_ms",
            n_samples_col="audio_n_samples" if cfg.check_audio else None,
            container_sr_col="audio_container_sr" if cfg.check_audio else None,
            silence_ratio_col="silence_ratio" if with_quality else None,
            wps_min=cfg.wps_min,
            wps_max=cfg.wps_max,
            speech_share_min=cfg.speech_share_min,
        )
        v = append_messages(v, ENTITY, F.col("_wps_label")).drop("_wps_label")
        if with_quality:
            v = append_messages(v, ENTITY, F.col("_speech_label")).drop(
                "_speech_label"
            )
    # bytes is a no-op drop when check_audio (never joined back);
    # audio_bytes_null is all-false on the validated side by now
    v = v.drop("bytes", "audio_bytes_null")
    if cfg.persist:
        v = v.persist()
        _persisted.append(v)
        # violation rows are tiny but their lineage re-scans the full
        # input (incl. `bytes` for the required-field rule); caching
        # them keeps every downstream action scan-free
        invalid = invalid.persist()
        _persisted.append(invalid)

    # ---- per-partition verdicts (the reference's per-table stats
    # rollup, data_validation_pipeline.py:84-118, made per-partition)
    part = cfg.partition_col
    soft_counts = v.groupBy(part).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~F.col(f"valid_{ENTITY}")).cast("long")).alias("n_soft_invalid"),
        F.sum((F.col(f"warning_msg_{ENTITY}") != "").cast("long")).alias("n_warnings"),
    )
    hard_counts = invalid.groupBy(part).agg(
        F.count_distinct(cfg.order_col).alias("n_hard_invalid")
    )
    verdicts = (
        soft_counts.join(hard_counts, part, "full_outer")
        .fillna(0, subset=["n_rows", "n_soft_invalid", "n_warnings", "n_hard_invalid"])
        .withColumn(
            "status",
            F.when(
                (F.col("n_hard_invalid") == 0) & (F.col("n_soft_invalid") == 0),
                F.lit("pass"),
            ).otherwise(F.lit("fail")),
        )
        .withColumn("rule_version", F.lit(cfg.rule_version))
    )

    # ---- column stats + histograms (single-pass each, SURVEY §2.4 A5/A10/A11)
    summary = stats.profile(clips.drop("bytes"), list(cfg.stats_specs))
    hist = stats.histogram(clips.drop("bytes"), list(cfg.hist_specs))

    drift_df = None
    if baseline_hist is not None:
        drift_df = drift.drift_verdicts(baseline_hist, hist)

    return ValidationResult(
        validated=v,
        invalid=invalid,
        partition_verdicts=verdicts,
        summary_stats=summary,
        histograms=hist,
        drift=drift_df,
        ref_winners=ref_winners,
        orphan_transcripts=orphan_transcripts,
        persisted=_persisted,
    )
