"""PII screen/mask/label (operators/privacy.py): hit detection per
pattern, single-aggregate scan counts, masking order, null safety."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_validator_spark.operators.privacy import (
    PII_PATTERNS,
    pii_label,
    pii_mask,
    pii_scan,
)

ROWS = [
    Row(i=1, t="email me at jo.doe+spam@corp.example.org today"),
    Row(i=2, t="ssn is 123-45-6789 ok"),
    Row(i=3, t="call +14155550123 now"),
    Row(i=4, t="server 10.0.255.3 down"),
    Row(i=5, t="card 4111-1111 1111-1111 exp"),
    Row(i=6, t="perfectly clean text with words only"),
    Row(i=7, t=None),
    Row(i=8, t="double hit: a@b.io and 987-65-4321"),
]


def test_scan_counts(spark):
    df = spark.createDataFrame(ROWS)
    got = {
        (r["column_name"], r["pii_type"]): (r["n_rows"], r["n_hit_rows"])
        for r in pii_scan(df, ["t"]).collect()
    }
    assert got[("t", "email")] == (8, 2)
    assert got[("t", "ssn")] == (8, 2)
    assert got[("t", "phone_e164")] == (8, 1)
    assert got[("t", "ipv4")] == (8, 1)
    assert got[("t", "card16")] == (8, 1)
    assert len(got) == len(PII_PATTERNS)


def test_mask_redacts_all_types(spark):
    df = spark.createDataFrame(ROWS).withColumn("m", pii_mask(F.col("t")))
    got = {r["i"]: r["m"] for r in df.collect()}
    assert got[1] == "email me at <EMAIL> today"
    assert got[2] == "ssn is <SSN> ok"
    assert got[3] == "call <PHONE_E164> now"
    assert got[4] == "server <IPV4> down"
    assert got[5] == "card <CARD16> exp"
    assert got[6] == "perfectly clean text with words only"
    assert got[7] is None
    assert got[8] == "double hit: <EMAIL> and <SSN>"


def test_label_lists_types(spark):
    df = spark.createDataFrame(ROWS).withColumn("lab", pii_label(F.col("t")))
    got = {r["i"]: r["lab"] for r in df.collect()}
    assert got[1] == "pii_detected(email)"
    assert got[6] is None
    assert got[7] is None  # null text never labels
    assert got[8] == "pii_detected(email,ssn)"
