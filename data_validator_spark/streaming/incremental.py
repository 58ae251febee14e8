"""Structured Streaming ingestion for the clips table.

The reference is strictly batch (Cloud Run Job, daily cron —
/root/reference/settings.py:68, SURVEY.md §2.10); its incrementality
is job-level re-runs gated on row-count diffs
(/root/reference/shared/storage_services.py:58-91). The Spark-native
generalizations are:

  1. the per-partition checkpoint manifest (plans/manifest.py) for
     batch resume, and
  2. this module: `readStream` over the landing directory with
     `Trigger.AvailableNow` + a streaming checkpoint, so each
     invocation processes exactly the files that arrived since the
     last run and a killed job resumes without reprocessing —
     file-granular incrementality on top of the manifest's
     partition-granular one.

Semantics notes (documented, not hidden):
  - Stateless tiers (hard schema split, soft/warning rules — pure
    Column expressions) run directly on the stream.
  - Cross-row operators (clip_id uniqueness, transcript
    winner-selection) are scoped to the micro-batch inside
    `foreachBatch` — the standard Spark pattern for batch-only ops in
    a stream. Global uniqueness across the whole table remains the
    batch path's job (plans/validation.py via plans/manifest.py).
  - Event-time windowed verdicts with a watermark handle late files
    (`windowed_verdicts`).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_validator_spark.plans.validation import ValidationConfig, run_validation
from data_validator_spark.rules import clip_rules
from data_validator_spark.rules.compiler import apply_rules, hard_predicate

# input_hint shape + lineage columns the generator adds
CLIPS_STREAM_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, ingest_date date, ingest_seq long"
)


def clips_stream(
    spark: SparkSession,
    path: str,
    schema: str = CLIPS_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the clips landing directory. The file
    source tracks seen files in the streaming checkpoint, which is
    what makes `availableNow` runs incremental.

    Adds an `ingest_ts` event-time column (date-granular proxy derived
    from ingest_date) so windowed_verdicts' default ts_col works out of
    the box; callers with a real event-time column can overwrite it.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(path)
    if "ingest_ts" not in stream.columns and "ingest_date" in stream.columns:
        stream = stream.withColumn("ingest_ts", F.to_timestamp("ingest_date"))
    return stream


def validate_stream(
    stream: DataFrame, entity: str = "clip"
) -> tuple[DataFrame, DataFrame]:
    """Stateless rule tiers applied directly on a streaming DataFrame:
    (validated-with-messages, hard-invalid rows). Everything here is
    Column expressions, so it runs inside the stream with no state."""
    rules = clip_rules.all_clip_rules()
    pred = hard_predicate(rules)
    ok = apply_rules(stream.filter(~pred), rules, entity)
    bad = stream.filter(pred)
    return ok, bad


def windowed_verdicts(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    entity: str = "clip",
) -> DataFrame:
    """Event-time windowed verdict counts with a watermark for late
    data: the streaming analogue of the per-partition verdict rollup
    (plans/validation.py), emitting (window, n_rows, n_soft_invalid)."""
    ok, _ = validate_stream(stream, entity)
    return (
        ok.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col(f"valid_{entity}")).cast("long")).alias("n_soft_invalid"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_rows",
            "n_soft_invalid",
        )
    )


class QueryGroup:
    """StreamingQuery-shaped handle over several coordinated queries
    (awaitTermination / stop / isActive fan out to all members) — what
    run_incremental returns when the stateful dup-flag branch runs
    alongside the foreachBatch validation branch."""

    def __init__(self, queries: list[StreamingQuery]):
        self.queries = queries

    def awaitTermination(self, timeout: float | None = None) -> bool:
        ok = True
        for q in self.queries:
            r = q.awaitTermination(timeout)
            ok = ok and (r is None or bool(r))
        return ok

    @property
    def isActive(self) -> bool:
        return any(q.isActive for q in self.queries)

    def stop(self) -> None:
        for q in self.queries:
            q.stop()


def run_incremental(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    transcripts_ref: DataFrame | None = None,
    cfg: ValidationConfig = ValidationConfig(),
    on_batch: Callable[[DataFrame, int], None] | None = None,
    dedup_flags: bool = False,
    quality_watch: bool = False,
    watch_cols: tuple[str, ...] = ("dur_ms",),
    baseline_sketches: DataFrame | None = None,
    watch_n_sigma: float = 3.0,
    watch_alpha: float = 0.2,
) -> StreamingQuery:
    """One incremental validation pass: process every not-yet-seen file
    under `input_path`, run the FULL pipeline (incl. audio decode +
    SNR) per micro-batch, write outputs, then stop (availableNow).

    Outputs under `output_dir`, each batch in its own
    `batch_id=<id>/` partition directory written with overwrite mode —
    so a crash between the three writes followed by checkpoint-driven
    batch replay RE-WRITES the same directories instead of appending
    duplicates (the file source replays a batch with an identical file
    list, and the pipeline is deterministic, so replays converge:
    effectively-once output despite foreachBatch's at-least-once
    invocation contract). `on_batch` callbacks, by contrast, may fire
    more than once per batch on crash-replay.

      validated/batch_id=N/   soft-tier rows with flags/messages
      invalid/batch_id=N/     hard side-channel rows
      verdicts/batch_id=N/    per-partition verdicts
      _checkpoint/            streaming checkpoint (source file log) —
                              resume point for the next invocation

    dedup_flags=True additionally runs the CROSS-BATCH uniqueness
    branch (stateful.streaming_dedup_flags) as a sibling query over
    the same landing directory with its own checkpoint + state store:
    a clip_id whose first occurrence was in any EARLIER batch (or an
    earlier availableNow invocation — state lives in the checkpoint)
    is flagged the moment its duplicate arrives, closing the
    per-micro-batch scoping of the foreachBatch window ops. Output
    under `dup_flags/batch_id=N/` as (clip_id, ingest_seq, dup_rank,
    dup_label); join it to `validated/` on (clip_id, ingest_seq) —
    an ids-only merge, the payload never enters the state operator.
    The return value is then a QueryGroup (same awaitTermination /
    stop surface).

    quality_watch=True composes the two standalone monitors into the
    SAME invocation (no second pass over the data):

      * per batch, one t-digest partial-sketch row per watch_col
        appends under `watch/partials/batch_id=N` (the
        sketch_monitor recipe, but overwrite-per-batch so crash
        replays converge like the main outputs), and one metrics row
        (batch_id as the series position, row/violation counts)
        under `watch/metrics/batch_id=N`;
      * each batch then evaluates the watch: EWMA control charts over
        the accumulated metrics series (operators/control.
        manifest_monitor — a regression planted in batch N is flagged
        out_of_control BY batch N's own monitor output) written to
        `watch/alerts/batch_id=N`, plus — when baseline_sketches is
        given — KS/PSI sketch drift of the running merged snapshot vs
        the baseline to `watch/drift/batch_id=N`. Raw history is
        never re-scanned: the state read back is O(columns + batches)
        sketch/metric rows.
    """
    stream = clips_stream(spark, input_path)

    def _watch(res, batch_id: int) -> None:
        from data_validator_spark.operators.control import manifest_monitor
        from data_validator_spark.operators.drift import sketch_drift
        from data_validator_spark.operators.tdigest import (
            merge_sketch_table,
            tdigest_profile,
        )

        valid_side = res.validated
        tdigest_profile(valid_side, list(watch_cols)).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{output_dir}/watch/partials/batch_id={batch_id}"
        )
        res.partition_verdicts.agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_soft_invalid").cast("long").alias("n_soft_invalid"),
            F.sum("n_hard_invalid").cast("long").alias("n_hard_invalid"),
            F.sum("n_warnings").cast("long").alias("n_warnings"),
        ).select(
            F.lit(int(batch_id)).cast("long").alias("partition_value"),
            "n_rows",
            "n_soft_invalid",
            "n_hard_invalid",
            "n_warnings",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{output_dir}/watch/metrics/batch_id={batch_id}"
        )
        metrics = spark.read.parquet(f"{output_dir}/watch/metrics").drop(
            "batch_id"
        )
        manifest_monitor(
            metrics,
            alpha=watch_alpha,
            n_sigma=watch_n_sigma,
            limits_from_history=True,
        ).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{output_dir}/watch/alerts/batch_id={batch_id}")
        if baseline_sketches is not None:
            merged = merge_sketch_table(
                spark.read.parquet(f"{output_dir}/watch/partials").drop(
                    "batch_id"
                )
            )
            sketch_drift(baseline_sketches, merged).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{output_dir}/watch/drift/batch_id={batch_id}")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        res = run_validation(batch_df, transcripts_ref, cfg=cfg)
        res.validated.write.mode("overwrite").parquet(
            f"{output_dir}/validated/batch_id={batch_id}"
        )
        res.invalid.write.mode("overwrite").parquet(
            f"{output_dir}/invalid/batch_id={batch_id}"
        )
        res.partition_verdicts.coalesce(1).write.mode("overwrite").parquet(
            f"{output_dir}/verdicts/batch_id={batch_id}"
        )
        if quality_watch:
            _watch(res, batch_id)
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    main_q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{output_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    if not dedup_flags:
        return main_q

    from data_validator_spark.streaming.stateful import streaming_dedup_flags

    def _write_flags(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{output_dir}/dup_flags/batch_id={batch_id}"
        )

    flags_q = (
        streaming_dedup_flags(clips_stream(spark, input_path))
        .writeStream.foreachBatch(_write_flags)
        .option("checkpointLocation", f"{output_dir}/_flags_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    return QueryGroup([main_q, flags_q])
