"""Scalar function families (SURVEY.md §2.8) — the reference's
row-level coercions/normalizations re-expressed as Column expressions
so they stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRUE_SET = ["true", "1", "yes"]
_FALSE_SET = ["false", "0", "no", ""]


def coerce_bool(c: Column) -> Column:
    """'true'/'1'/'yes' -> True, 'false'/'0'/'no'/'' -> False, else NULL
    (reference core_models.py:799-813)."""
    s = F.lower(F.trim(c.cast("string")))
    return (
        F.when(s.isin(_TRUE_SET), F.lit(True))
        .when(s.isin(_FALSE_SET), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def nan_normalize(c: Column, numeric: bool = False) -> Column:
    """float NaN and 'nan'/'NaN' strings -> NULL (utils.py:351-362,
    core_models.py:136-152)."""
    if numeric:
        return F.when(F.isnan(c), F.lit(None)).otherwise(c)
    s = F.lower(F.trim(c))
    return F.when(s == "nan", F.lit(None)).otherwise(c)


def age_years(birth_year: Column, birth_month: Column, at_ts: Column) -> Column:
    """Age at timestamp from (year, month): mid-month (15th) birth
    assumption, /365.25, rounded 1dp — exact reference arithmetic
    (core_models.py:347-370). Invalid y/m -> NULL (guard semantics)."""
    valid = (
        birth_year.isNotNull()
        & birth_month.isNotNull()
        & (birth_month >= 1)
        & (birth_month <= 12)
        & (birth_year > 1900)
    )
    birth = F.make_date(birth_year, birth_month, F.lit(15))
    return F.when(
        valid, F.round(F.datediff(F.to_date(at_ts), birth) / F.lit(365.25), 1)
    )


_SHORT_LANG_MAP = {
    "en": "en-US",
    "es": "es-CO",
    "de": "de-DE",
    "fr": "fr-CA",
    "nl": "nl-NL",
}
BCP47_RE = r"^[a-z]{2}-[A-Z]{2}$"


def normalize_language(c: Column) -> Column:
    """Short-code expansion + region uppercasing, then BCP-47 check is
    applied by the regex_format rule (core_models.py:815-869)."""
    s = F.trim(c)
    expanded = s
    for short, full in _SHORT_LANG_MAP.items():
        expanded = F.when(F.lower(s) == short, F.lit(full)).otherwise(expanded)
    parts = F.split(expanded, "-")
    recased = F.when(
        F.size(parts) == 2,
        F.concat_ws("-", F.lower(parts[0]), F.upper(parts[1])),
    ).otherwise(expanded)
    return recased


_CAMEL_RE = re.compile(r"(?<!^)(?=[A-Z])")


def camel_to_snake(name: str) -> str:
    """camelCase -> snake_case (utils.py:337-348)."""
    return _CAMEL_RE.sub("_", name).lower().replace("__", "_")


def rename_snake(df: DataFrame) -> DataFrame:
    """One-time ingest projection renaming every column to snake_case
    (the P1 rename-projection, utils.py:321-348)."""
    return df.toDF(*[camel_to_snake(c) for c in df.columns])


def pseudonymize(c: Column, salt: str = "", reference_compat: bool = False) -> Column:
    """Deterministic pseudonym: blake2b(value+salt) -> base32.

    Two output modes (same construction family as the reference's
    pseudonymizer, utils.py:580-627):

      default (reference_compat=False): the deliberately STRICTER
        length-preserving variant — digest_size=20, lowercase base32,
        exact length preservation with cycling for long inputs, and
        '' -> ''.
      reference_compat=True: byte-for-byte the reference's output
        shape for cross-system join compatibility — digest_size=24,
        uppercase base32 ('=' stripped), truncated to max(16,
        len(value)) so short inputs GROW to 16 chars and inputs longer
        than the 39-char digest encoding are capped at 39; '' -> a
        16-char pseudonym. (The reference memoizes per-process in a
        dict; memoization is an executor-local detail, values agree.)

    NULL -> NULL in both modes. Vectorized pandas UDF (hashlib
    releases the GIL per call; Arrow batches amortize)."""
    import base64
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _p(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            if reference_compat:
                d = hashlib.blake2b(
                    (v + salt).encode("utf-8"), digest_size=24
                ).digest()
                enc = base64.b32encode(d).decode("ascii").rstrip("=")
                return enc[: max(16, len(v))]
            d = hashlib.blake2b((v + salt).encode("utf-8"), digest_size=20).digest()
            enc = base64.b32encode(d).decode("ascii").rstrip("=").lower()
            n = len(v)
            if n == 0:
                return ""
            if len(enc) < n:
                enc = enc * (n // len(enc) + 1)
            return enc[:n]

        return s.map(one)

    return _p(c.cast("string"))


def near_match_label(
    a: Column, b: Column, max_dist: int = 3, name: str = "near_match"
) -> Column:
    """Edit-distance near-match classifier (pure Column expr,
    JVM-side `levenshtein`): NULL when either side is NULL, 'exact'
    when equal, '<name>(d)' when 0 < levenshtein <= max_dist (the
    reference's value-echoing label shape, core_models.py:169-202),
    'mismatch(>max_dist)' beyond. Generalizes the flagship's strict
    transcript-equality invariant to a graded verdict a curation
    pipeline can threshold on — e.g. tolerate d<=2 transcription
    slips while still quarantining real mismatches.

    Uses the BANDED 3-arg levenshtein (threshold form, -1 beyond):
    O(len * max_dist) instead of the full O(len^2) DP — on ~300-char
    transcripts that is a ~50x cut, and the label never needed the
    exact distance of a far pair (it printed it, nobody could
    threshold on it). Measured: q68's label pass dropped from the
    dominant cost of a 74 s query to noise."""
    d = F.levenshtein(a, b, max_dist)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("string"))
        # equality short-circuit: the overwhelmingly common case in a
        # validation run is transcript == reference; an O(len) byte
        # compare answers it without touching the DP band at all
        .when(a == b, F.lit("exact"))
        .when(
            d > 0,
            F.concat(F.lit(name + "("), d.cast("string"), F.lit(")")),
        )
        .otherwise(F.lit(f"mismatch(>{max_dist})"))
    )
