"""PII screening + redaction for training-data pipelines: pattern
scan (email / phone / SSN / IPv4 / card-shaped numbers) and masking.

A corpus destined for model training must be screened for personal
data before use; the reference's validator-per-field model
(VALIDATION_RULES.md soft tier) extends naturally to content-level
screens — a PII hit is a soft-tier label on the row plus a corpus-
level rate per (column, pii_type).

Scale design: ONE aggregate pass computes every (column x pattern)
row-hit count map-side (`sum(rlike(..)::long)` partials — the shuffle
carries a handful of longs per partition, never text), then a tiny
literal unpivot to long format. Masking is chained `regexp_replace`
Column expressions — JVM regex, whole-stage codegen, no Python.

Pattern portability: regexes restricted to the Java-regex /
RE2(DuckDB) common subset — character classes, bounded repeats, \\b
word boundaries; no backreferences or lookaround — so DuckDB oracles
reproduce hits exactly.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: masking applies in this order (email before phone so the
# digits inside an already-masked token can't double-match)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone_e164": r"\+\d{10,13}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "card16": r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
}


def pii_scan(
    df: DataFrame,
    cols: Sequence[str],
    patterns: Mapping[str, str] | None = None,
) -> DataFrame:
    """-> (column_name, pii_type, n_rows, n_hit_rows, hit_rate): rows
    containing at least one match, per column x pattern, from ONE
    fused aggregate."""
    pats = dict(patterns or PII_PATTERNS)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        for name, rx in pats.items():
            aggs.append(
                F.sum(
                    F.coalesce(F.col(c).rlike(rx), F.lit(False)).cast("long")
                ).alias(f"_h_{c}_{name}")
            )
    wide = df.agg(*aggs)
    stack = []
    for c in cols:
        for name in pats:
            stack.append(
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.lit(name).alias("pii_type"),
                    F.col(f"_h_{c}_{name}").alias("n_hit_rows"),
                )
            )
    return (
        wide.select(
            F.col("_n").alias("n_rows"),
            F.explode(F.array(*stack)).alias("s"),
        )
        .select(
            F.col("s.column_name"),
            F.col("s.pii_type"),
            F.col("n_rows"),
            F.col("s.n_hit_rows"),
            F.round(F.col("s.n_hit_rows") / F.greatest("n_rows", F.lit(1)), 6)
            .alias("hit_rate"),
        )
    )


def pii_mask(
    c: Column, patterns: Mapping[str, str] | None = None
) -> Column:
    """Redact every pattern hit with `<TYPE>` placeholders — the
    standard pre-training scrub. Chained regexp_replace, applied in
    PII_PATTERNS order (emails first: their local part may otherwise
    partially match numeric patterns)."""
    out = c
    for name, rx in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, rx, f"<{name.upper()}>")
    return out


def pii_label(
    c: Column,
    patterns: Mapping[str, str] | None = None,
    name: str = "pii_detected",
) -> Column:
    """Soft-tier label listing the matched PII types, reference
    message style: `pii_detected(email,ssn)` or NULL."""
    pats = dict(patterns or PII_PATTERNS)
    hits = F.filter(
        F.array(
            *[
                F.when(
                    F.coalesce(c.rlike(rx), F.lit(False)), F.lit(t)
                )
                for t, rx in pats.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return F.when(
        F.size(hits) > 0,
        F.concat(
            F.lit(f"{name}("), F.array_join(hits, ","), F.lit(")")
        ),
    )
