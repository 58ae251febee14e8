"""Structured Streaming: availableNow incremental validation with
checkpoint resume, stateless rule tiers on a stream, windowed verdicts."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_validator_spark.fixtures.clips import ClipsConfig, generate_clips
from data_validator_spark.plans.validation import ValidationConfig
from data_validator_spark.streaming import (
    clips_stream,
    run_incremental,
    validate_stream,
    windowed_verdicts,
)

CFG_A = ClipsConfig(n_rows=800, n_partitions=2, max_synth_ms=300)
CFG_B = ClipsConfig(
    n_rows=600, n_partitions=2, max_synth_ms=300, clip_id_prefix="clipb"
)


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir, out_dir = str(base / "landing"), str(base / "out")
    generate_clips(spark, CFG_A).write.mode("append").parquet(in_dir)
    return in_dir, out_dir


def test_incremental_first_pass(spark, stream_dirs):
    in_dir, out_dir = stream_dirs
    q = run_incremental(
        spark, in_dir, out_dir, cfg=ValidationConfig(check_audio=True)
    )
    q.awaitTermination(600)
    validated = spark.read.parquet(f"{out_dir}/validated")
    invalid = spark.read.parquet(f"{out_dir}/invalid")
    n_v, n_hard = validated.count(), invalid.select("ingest_seq").distinct().count()
    assert n_v + n_hard == CFG_A.n_rows
    # full pipeline ran: audio outcome columns are present and populated
    assert "audio_snr_db" in validated.columns
    assert validated.filter(F.col("audio_snr_db").isNotNull()).count() > 0
    verdicts = spark.read.parquet(f"{out_dir}/verdicts")
    assert verdicts.select("batch_id").distinct().count() == 1


def test_incremental_resume_processes_only_new_files(spark, stream_dirs):
    in_dir, out_dir = stream_dirs
    # second batch of files lands; a NEW availableNow query on the SAME
    # checkpoint must process only those
    generate_clips(spark, CFG_B).write.mode("append").parquet(in_dir)
    q = run_incremental(
        spark, in_dir, out_dir, cfg=ValidationConfig(check_audio=True)
    )
    q.awaitTermination(600)
    validated = spark.read.parquet(f"{out_dir}/validated")
    total = validated.count() + spark.read.parquet(
        f"{out_dir}/invalid"
    ).select("ingest_seq", "clip_id").distinct().count()
    assert total == CFG_A.n_rows + CFG_B.n_rows
    # batch-2 output contains only batch-B clip ids (no reprocessing)
    b2 = validated.filter(F.col("clip_id").startswith("clipb"))
    b1_again = (
        spark.read.parquet(f"{out_dir}/verdicts")
        .filter(F.col("batch_id") == 1)
    )
    assert b2.count() > 0
    assert b1_again.agg(F.sum("n_rows")).collect()[0][0] <= CFG_B.n_rows


def test_stateless_tiers_run_on_stream(spark, stream_dirs):
    in_dir, _ = stream_dirs
    stream = clips_stream(spark, in_dir)
    assert stream.isStreaming
    ok, bad = validate_stream(stream)
    assert ok.isStreaming and bad.isStreaming
    assert "validation_msg_clip" in ok.columns


def test_windowed_verdicts_with_watermark(spark, stream_dirs, tmp_path):
    in_dir, _ = stream_dirs
    stream = clips_stream(spark, in_dir).withColumn(
        "ingest_ts",
        F.to_timestamp("ingest_date")
        + F.make_interval(secs=(F.col("ingest_seq") % 7200).cast("double")),
    )
    wv = windowed_verdicts(stream, ts_col="ingest_ts", window="1 hour")
    q = (
        wv.writeStream.format("memory")
        .queryName("wv_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    rows = spark.sql("select * from wv_sink").collect()
    # appends only emit windows the watermark has closed; the final
    # open window stays in state — so strictly fewer rows than windows
    assert len(rows) >= 1
    assert all(r.n_rows > 0 for r in rows)
