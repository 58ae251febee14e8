"""Compile constraint SUGGESTIONS into enforceable rules.

Closes the profile -> enforce loop: operators/suggest.py proposes
constraints from a clean snapshot; this module turns those rows into
the same declarative Rule objects the hand-written families produce
(rules/spec.py), so the compiler folds them into the standard
validation_msg / valid columns with zero new execution machinery.

Mapping:
  not_null      -> spec.required(col)            (row-local)
  range         -> spec.bounds(col, lo, hi)      (row-local, under/over)
  non_negative  -> bounds lower edge at 0 — emitted only when the
                   column has NO range suggestion (range subsumes it)
  is_in         -> spec.allowed_set(col, values) (row-local)
  unique        -> NOT row-local (needs a global aggregate): returned
                   separately as a dataset-level check descriptor the
                   caller hands to the uniqueness/dedup operators
                   (operators/dedup.py) — mirroring how the reference
                   separates per-doc validators from collection-wide
                   duplicate sweeps.
"""

from __future__ import annotations

import json
import math
from typing import Iterable

from data_validator_spark.rules import spec


def rules_from_suggestions(
    suggestions: Iterable,
    tier: str = spec.SOFT,
) -> tuple[list[spec.Rule], list[dict]]:
    """suggestions: collected rows (or a DataFrame) produced by
    operators/suggest.suggest_constraints. Returns (row_rules,
    dataset_checks); dataset_checks entries are {'check': 'unique',
    'column': col}."""
    rows = (
        suggestions.collect()
        if hasattr(suggestions, "collect")
        else list(suggestions)
    )
    by_col: dict[str, dict[str, object]] = {}
    for r in rows:
        by_col.setdefault(r["column_name"], {})[r["constraint"]] = r

    rules: list[spec.Rule] = []
    checks: list[dict] = []
    for col in sorted(by_col):
        cons = by_col[col]
        if "not_null" in cons:
            rules.append(spec.required(col, tier=tier))
        if "range" in cons:
            r = cons["range"]
            rules.extend(
                spec.bounds(col, float(r["lo"]), float(r["hi"]), tier=tier)
            )
        elif "non_negative" in cons:
            rules.extend(spec.bounds(col, 0.0, math.inf, tier=tier))
        if "is_in" in cons:
            # `allowed` is a JSON array string from suggest_constraints
            # (a comma-split would shred any value containing a comma
            # into fragments that reject valid rows)
            allowed = json.loads(cons["is_in"]["allowed"] or "[]")
            rules.append(spec.allowed_set(col, allowed, tier=tier))
        if "unique" in cons:
            checks.append({"check": "unique", "column": col})
    return rules, checks
