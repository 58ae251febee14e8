"""Constraint suggestion: profile a table once and propose the rules
a validator should enforce on it.

The bootstrap step of a validation engine (Deequ's
ConstraintSuggestionRunner is the public prior art): instead of a
human writing `clip_id is unique, sr_hz in {8000..48000}` by hand,
profile the current snapshot and emit candidate constraints the
reference's rule families (rules/spec.py) can then enforce and the
drift suite can watch. Suggested families:

  not_null       zero NULLs observed
  unique         distinct count == non-null count (key candidate)
  non_negative   numeric min >= 0
  range          numeric [min, max] envelope
  is_in          string column with <= low_card_max distinct values,
                 the sorted value set attached as a JSON array string

Execution shape: ONE fused Aggregate computes every column's
null/distinct/min/max in a single scan (Catalyst merges the
expressions; map-side partial aggregation applies). The single stats
row comes to the driver — one row, not a collect() loop — and only
the columns that profiled as low-cardinality strings pay a second
tiny aggregate to fetch their value sets. exact=False (the 10^12-row
path) swaps count_distinct for the HLL sketch and widens the unique
test by the sketch's error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

_SCHEMA = (
    "column_name string, constraint string, lo double, hi double, "
    "allowed string"
)


def suggest_constraints(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = True,
    low_card_max: int = 12,
    hll_rsd: float = 0.02,
) -> DataFrame:
    """-> (column_name, constraint, lo, hi, allowed) — one row per
    suggested constraint, deterministic given the input.

    exact=True uses exact count_distinct (small/medium tables, oracle
    replays); exact=False uses approx_count_distinct and only claims
    `unique` when the sketch estimate is within its relative error of
    the non-null count (a key candidate to CONFIRM with the exact
    uniqueness operator, not a proof).
    """
    spark = df.sparkSession
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    fields = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"nn_{c}"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(c, hll_rsd)
            ).cast("long").alias(f"nd_{c}")
        )
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"lo_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"hi_{c}"))
    stats = df.agg(*aggs).collect()[0]

    out: list[tuple] = []
    low_card_strings: list[str] = []
    n = stats["_n"]
    for c in cols:
        nn, nd = stats[f"nn_{c}"], stats[f"nd_{c}"]
        if n > 0 and nn == n:
            out.append((c, "not_null", None, None, None))
        if nn > 0:
            unique = (
                nd == nn if exact else abs(nd - nn) <= 3 * hll_rsd * nn
            )
            if unique:
                out.append((c, "unique", None, None, None))
        if isinstance(fields[c], _NUMERIC) and nn > 0:
            lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
            out.append((c, "range", round(lo, 6), round(hi, 6), None))
            if lo >= 0:
                out.append((c, "non_negative", None, None, None))
        if isinstance(fields[c], T.StringType) and 0 < nd <= low_card_max:
            low_card_strings.append(c)

    if low_card_strings:
        # JSON-encoded sorted value set ('["BLUE","RED"]'): a plain
        # comma-join is ambiguous the moment a value contains a comma,
        # and rules_from_suggestions round-trips this column back into
        # an enforceable allowed_set rule
        sets = df.agg(
            *[
                F.to_json(
                    F.sort_array(F.collect_set(F.col(c).cast("string")))
                ).alias(c)
                for c in low_card_strings
            ]
        ).collect()[0]
        for c in low_card_strings:
            out.append((c, "is_in", None, None, sets[c]))

    return spark.createDataFrame(out, _SCHEMA)


def candidate_keys(
    df: DataFrame,
    cols: list[str],
    max_width: int = 2,
    exact: bool = True,
    hll_rsd: float = 0.02,
) -> DataFrame:
    """Composite-key mining: -> (key, width, n_rows, n_distinct,
    is_key, is_minimal) for every column combination up to max_width.

    The multi-column extension of the `unique` suggestion: when no
    single column is a key, which pair (triple, ...) is? A combo is a
    key when its distinct count equals its row count over rows where
    EVERY member is non-null (null keys can't identify anything);
    is_minimal marks keys none of whose proper subsets (within the
    evaluated set) already hold.

    Execution: ONE aggregate computes every combo's distinct count.
    exact=True uses count_distinct (each multi-distinct adds an Expand
    duplication — fine for the handful of columns key mining ever
    scans); exact=False uses HLL over a struct, no Expand, and flags
    key CANDIDATES within sketch error for the exact operator to
    confirm — the 10^12-row path.
    """
    from itertools import combinations

    combos: list[tuple[str, ...]] = []
    for w in range(1, max_width + 1):
        combos.extend(combinations(cols, w))

    aggs = []
    for combo in combos:
        name = ",".join(combo)
        nonnull = F.lit(True)
        for c in combo:
            nonnull = nonnull & F.col(c).isNotNull()
        aggs.append(
            F.sum(nonnull.cast("long")).cast("long").alias(f"n_{name}")
        )
        if exact:
            nd = F.count_distinct(*[F.col(c) for c in combo])
        else:
            nd = F.approx_count_distinct(
                F.struct(*[F.col(c) for c in combo]), hll_rsd
            )
        aggs.append(nd.cast("long").alias(f"d_{name}"))
    stats = df.agg(*aggs).collect()[0]

    keyset: set[tuple[str, ...]] = set()
    rows = []
    for combo in combos:
        name = ",".join(combo)
        n, d = stats[f"n_{name}"], stats[f"d_{name}"]
        is_key = (
            (n > 0 and d == n)
            if exact
            else (n > 0 and abs(d - n) <= 3 * hll_rsd * n)
        )
        if is_key:
            keyset.add(combo)
        rows.append((combo, name, len(combo), n, d, is_key))
    out = []
    for combo, name, width, n, d, is_key in rows:
        minimal = is_key and not any(
            set(sub) < set(combo) for sub in keyset if sub != combo
        )
        out.append((name, width, n, d, is_key, minimal))
    return df.sparkSession.createDataFrame(
        out,
        "key string, width int, n_rows long, n_distinct long, "
        "is_key boolean, is_minimal boolean",
    )


# format library for format_profile: anchored, engine-portable
# character-class regexes (no \\d, no lookaround — identical semantics
# in Java regex and RE2-family engines an oracle might use)
FORMAT_PATTERNS: dict[str, str] = {
    "uuid": "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
    "iso_date": "^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "iso_timestamp": "^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}",
    "integer": "^-?[0-9]+$",
    "decimal": "^-?[0-9]+[.][0-9]+$",
    "email": "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}$",
    "bcp47_lang": "^[a-z]{2,3}(-[A-Za-z0-9]{2,8})*$",
    "lower_snake": "^[a-z]+(_[a-z]+)*$",
    "upper_token": "^[A-Z]+$",
}


def format_profile(
    df: DataFrame,
    cols: list[str],
    patterns: dict[str, str] | None = None,
    suggest_min_rate: float = 0.95,
) -> DataFrame:
    """Regex-format conformance per (column, format): ->
    (column_name, format, n_nonnull, n_match, match_rate, suggest).

    The format-mining step behind rules/spec.regex_format (the
    reference's invalid_language_format rule is one hand-written
    instance — core_models.py:860-869): measure how much of each
    string column already conforms to each library pattern and
    suggest enforcing the ones at/above suggest_min_rate. Every
    (column, pattern) pair is one rlike sum inside ONE fused
    Aggregate — a single scan regardless of how many formats are
    screened. Rows per column: len(patterns), emitted only for
    formats with at least one match (a column matching nothing
    suggests nothing).
    """
    pats = patterns or FORMAT_PATTERNS
    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"nn_{c}"))
        for name, rx in pats.items():
            aggs.append(
                F.sum(
                    F.coalesce(
                        F.col(c).cast("string").rlike(rx), F.lit(False)
                    ).cast("long")
                )
                .cast("long")
                .alias(f"m_{c}_{name}")
            )
    stats = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        nn = stats[f"nn_{c}"]
        for name in pats:
            m = stats[f"m_{c}_{name}"]
            if m == 0:
                continue
            rate = round(m / nn, 6) if nn else 0.0
            out.append((c, name, nn, m, rate, nn > 0 and rate >= suggest_min_rate))
    return df.sparkSession.createDataFrame(
        out,
        "column_name string, format string, n_nonnull long, n_match long, "
        "match_rate double, suggest boolean",
    )
