"""Resume-from-checkpoint semantics (north rule): a completed run
leaves nothing pending; new/changed partitions re-validate alone."""

from pyspark.sql import functions as F

from data_validator_spark.plans.manifest import (
    CheckpointManifest,
    partition_fingerprints,
    pending_partitions,
    run_resumable,
)
from data_validator_spark.plans.validation import ValidationConfig

CFG = ValidationConfig(check_audio=False)  # metadata-only: fast


def test_full_run_then_nothing_pending(spark, clips, transcripts_ref, tmp_path):
    manifest = CheckpointManifest(str(tmp_path / "manifest"))
    todo, result = run_resumable(spark, clips, manifest, transcripts_ref, cfg=CFG)
    assert len(todo) == clips.select("ingest_date").distinct().count()
    assert result is not None
    # second run: manifest says everything is validated
    todo2, result2 = run_resumable(spark, clips, manifest, transcripts_ref, cfg=CFG)
    assert todo2 == [] and result2 is None


def test_kill_and_resume_validates_only_remainder(spark, clips, transcripts_ref, tmp_path):
    manifest = CheckpointManifest(str(tmp_path / "manifest"))
    parts = sorted(
        r.ingest_date for r in clips.select("ingest_date").distinct().collect()
    )
    half = [str(p) for p in parts[: len(parts) // 2]]
    # simulate a killed job: only half the partitions were validated
    subset = clips.filter(F.col("ingest_date").cast("string").isin(half))
    run_resumable(spark, subset, manifest, transcripts_ref, cfg=CFG)
    # restart over the full table: only the other half is pending
    pend = pending_partitions(spark, clips, manifest, CFG)
    assert sorted(pend) == sorted(str(p) for p in parts[len(parts) // 2 :])


def test_changed_partition_revalidates(spark, clips, transcripts_ref, tmp_path):
    manifest = CheckpointManifest(str(tmp_path / "manifest"))
    run_resumable(spark, clips, manifest, transcripts_ref, cfg=CFG)
    # mutate one partition's content (drop a row) -> fingerprint changes
    parts = sorted(str(r.ingest_date) for r in clips.select("ingest_date").distinct().collect())
    target = parts[0]
    mutated = clips.filter(
        ~((F.col("ingest_date").cast("string") == target) & (F.col("ingest_seq") % 97 == 0))
    )
    pend = pending_partitions(spark, mutated, manifest, CFG)
    assert pend == [target]


def test_rule_version_bump_revalidates_everything(spark, clips, transcripts_ref, tmp_path):
    manifest = CheckpointManifest(str(tmp_path / "manifest"))
    run_resumable(spark, clips, manifest, transcripts_ref, cfg=CFG)
    import dataclasses

    cfg2 = dataclasses.replace(CFG, rule_version="clip-rules-v2")
    pend = pending_partitions(spark, clips, manifest, cfg2)
    assert len(pend) == clips.select("ingest_date").distinct().count()


def test_fingerprint_order_independent(spark, clips):
    fp1 = {r.partition_value: r.fingerprint for r in partition_fingerprints(clips, "ingest_date").collect()}
    shuffled = clips.orderBy(F.rand(7))
    fp2 = {r.partition_value: r.fingerprint for r in partition_fingerprints(shuffled, "ingest_date").collect()}
    assert fp1 == fp2


def test_deferred_record_is_the_commit_point(spark, clips, transcripts_ref, tmp_path):
    """record=False: a crash BETWEEN validation and output writes must
    leave every partition pending (manifest untouched); recording
    result.manifest_rows afterwards commits them."""
    m = CheckpointManifest(str(tmp_path / "manifest"))
    cfg = ValidationConfig(check_audio=False)
    todo, result = run_resumable(spark, clips, m, transcripts_ref, cfg=cfg, record=False)
    assert todo and result is not None and result.manifest_rows is not None
    # simulated crash before record: everything still pending
    todo2, _ = run_resumable(spark, clips, m, transcripts_ref, cfg=cfg, record=False)
    assert sorted(todo2) == sorted(todo)
    # commit, then nothing is pending
    m.record(result.manifest_rows)
    todo3, result3 = run_resumable(spark, clips, m, transcripts_ref, cfg=cfg)
    assert todo3 == [] and result3 is None
