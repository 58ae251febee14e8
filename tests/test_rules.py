"""Metadata rule tier tests: compiler semantics + golden cross-check."""

from pyspark.sql import functions as F

from data_validator_spark.rules.clip_rules import all_clip_rules
from data_validator_spark.rules.compiler import apply_rules, split_hard


def test_hard_tier_matches_golden(spark, clips, golden):
    _, invalid = split_hard(clips, all_clip_rules(), "clip", ["clip_id", "ingest_seq"])
    got = {r.rule: r.cnt for r in invalid.groupBy("rule").agg(F.count("*").alias("cnt")).collect()}
    exp = golden.agg(
        F.sum(F.col("inj_bytes_null").cast("long")).alias("bytes_missing"),
        F.sum(F.col("inj_codec_null").cast("long")).alias("codec_missing"),
        F.sum(F.col("inj_codec_unknown").cast("long")).alias("codec_unknown"),
    ).collect()[0]
    assert got.get("bytes_missing", 0) == exp.bytes_missing
    assert got.get("codec_missing", 0) == exp.codec_missing
    assert got.get("codec_unknown", 0) == exp.codec_unknown
    # normalized error columns present (invalid_data analogue)
    row = invalid.filter(F.col("rule") == "codec_unknown").first()
    assert row.invalid_key == "codec" and row.invalid_value == "amr"


def test_soft_tier_matches_golden(spark, clips, golden):
    ok, _ = split_hard(clips, all_clip_rules(), "clip", ["clip_id", "ingest_seq"])
    v = apply_rules(ok, all_clip_rules(), "clip")
    j = v.join(golden, ["ingest_seq"], "inner")
    # every injected dur/sr/transcript violation is flagged with its label
    bad = j.filter(
        (F.col("inj_dur_null") & ~F.col("validation_msg_clip").contains("dur_ms_missing"))
        | (F.col("inj_dur_low") & ~F.col("validation_msg_clip").contains("dur_ms_under_min("))
        | (F.col("inj_dur_high") & ~F.col("validation_msg_clip").contains("dur_ms_over_max("))
        | (F.col("inj_sr_invalid") & ~F.col("validation_msg_clip").contains("sr_hz_invalid("))
        | (F.col("inj_transcript_empty") & ~F.col("validation_msg_clip").contains("transcript_empty"))
    )
    assert bad.count() == 0
    # clean rows (no injections at all) are valid with empty messages
    clean = j.filter(
        ~F.col("inj_dur_null") & ~F.col("inj_dur_low") & ~F.col("inj_dur_high")
        & ~F.col("inj_dur_warn") & ~F.col("inj_sr_invalid") & ~F.col("inj_transcript_empty")
    )
    assert clean.filter(~F.col("valid_clip")).count() == 0


def test_warning_tier_does_not_flip_valid(spark, clips, golden):
    ok, _ = split_hard(clips, all_clip_rules(), "clip", ["clip_id", "ingest_seq"])
    v = apply_rules(ok, all_clip_rules(), "clip")
    j = v.join(golden, ["ingest_seq"], "inner")
    warn = j.filter(F.col("inj_dur_warn"))
    assert warn.count() > 0
    # warning label fires...
    assert warn.filter(~F.col("warning_msg_clip").contains("dur_ms_suspicious_long(")).count() == 0
    # ...and valid_clip is unaffected except where the mulaw 30s
    # override makes the same value a soft over_max violation
    flipped = warn.filter(~F.col("valid_clip") & (F.col("codec") != "mulaw"))
    assert flipped.filter(~F.col("validation_msg_clip").contains("sr_hz_invalid")
                          & ~F.col("validation_msg_clip").contains("transcript_empty")).count() == 0


def test_message_order_is_declaration_order(spark):
    # a row violating dur bounds AND sr AND transcript: labels must join
    # in declared order dur -> sr -> transcript (core_models.py:470-482
    # ordering contract, graft-translated)
    df = spark.createDataFrame(
        [("c1", b"x", 999, 70_000_000, "pcm16", "")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    )
    v = apply_rules(df, all_clip_rules(), "clip")
    msg = v.first().validation_msg_clip
    assert msg == "dur_ms_over_max(70000000);sr_hz_invalid(999);transcript_empty"


def test_required_when(spark):
    from pyspark.sql import functions as F

    from data_validator_spark.rules import apply_rules
    from data_validator_spark.rules.spec import required_when

    df = spark.createDataFrame(
        [
            ("flac", None),      # condition holds, col null -> violation
            ("flac", "x"),       # condition holds, present -> ok
            ("opus", None),      # condition false -> ok
            (None, None),        # NULL condition -> never fires
        ],
        "codec string, container string",
    )
    rule = required_when(
        "container", F.col("codec") == "flac", label="container_missing_for_flac"
    )
    out = apply_rules(df, [rule], "t").collect()
    msgs = [r["validation_msg_t"] for r in out]
    assert msgs[0] == "container_missing_for_flac"
    assert msgs[1] == "" and msgs[2] == "" and msgs[3] == ""


def test_snr_per_codec_override(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from data_validator_spark.audio import codecs, synth
    from data_validator_spark.audio.checks import run_audio_checks

    sr, n = 16000, 4000
    pcm = synth.reference_pcm("snr-ovr-1", sr, n)
    rows = [
        ("snr-ovr-1", "adpcm", sr, codecs.encode("adpcm", pcm, sr)),
        ("snr-ovr-2", "pcm16", sr, codecs.encode("pcm16", synth.reference_pcm("snr-ovr-2", sr, n), sr)),
    ]
    df = spark.createDataFrame(rows, "clip_id string, codec string, sr_hz int, bytes binary")
    strict = {r["clip_id"]: r for r in run_audio_checks(df, snr_min=90.0).collect()}
    # at a 90 dB bar both codecs fail (ADPCM ~24 dB, pcm16 ~88 dB)
    assert strict["snr-ovr-1"]["_snr_label"] is not None
    assert strict["snr-ovr-2"]["_snr_label"] is not None
    relaxed = {
        r["clip_id"]: r
        for r in run_audio_checks(
            df, snr_min=90.0, snr_min_by_codec={"adpcm": 15.0, "pcm16": 80.0}
        ).collect()
    }
    assert relaxed["snr-ovr-1"]["_snr_label"] is None  # adpcm bar lowered
    assert relaxed["snr-ovr-2"]["_snr_label"] is None  # pcm16 bar lowered
