"""Declarative rule model.

The reference encodes rules as Pydantic field/model validators that
mutate ``validation_msg_*`` / ``warning_msg_*`` strings row-at-a-time
(/root/reference/validators/core_models.py:136-272, 426-438, 462-516).
Here a rule is data: a null-safe violation predicate Column + a
message Column. The compiler (rules/compiler.py) folds an ordered
rule list into three columns per entity, keeping everything inside
whole-stage codegen.

Tier semantics (reference VALIDATION_RULES.md:22-34):
  HARD    -> row diverted to the invalid side-channel table
  SOFT    -> row kept; label appended to validation_msg; valid=false
  WARNING -> label appended to warning_msg; valid unaffected
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

HARD = "hard"
SOFT = "soft"
WARNING = "warning"


@dataclass(frozen=True)
class Rule:
    name: str
    tier: str
    predicate: Column  # True => violation; must be null-safe (no NULL result)
    message: Column  # label emitted when violated
    # hard-tier metadata for the invalid side-channel
    # (reference entity_controller.py:148-191 error normalization)
    invalid_key: str | None = None
    expected: str | None = None


def _safe(pred: Column) -> Column:
    return F.coalesce(pred, F.lit(False))


def _labeled(label: str, value: Column | None) -> Column:
    """`label(value)` with the offending value interpolated — the
    reference echoes values inside labels (core_models.py:472)."""
    if value is None:
        return F.lit(label)
    return F.concat(F.lit(label + "("), F.coalesce(value.cast("string"), F.lit("null")), F.lit(")"))


def required(col: str, tier: str = HARD, expected: str = "non-null value") -> Rule:
    return Rule(
        name=f"{col}_missing",
        tier=tier,
        predicate=F.col(col).isNull(),
        message=F.lit(f"{col}_missing"),
        invalid_key=col,
        expected=expected,
    )


def not_empty(col: str, tier: str = SOFT) -> Rule:
    c = F.col(col)
    return Rule(
        name=f"{col}_empty",
        tier=tier,
        predicate=_safe(c.isNull() | (F.trim(c) == "")),
        message=F.lit(f"{col}_empty"),
        invalid_key=col,
        expected="non-empty string",
    )


def allowed_set(
    col: str,
    values: Iterable,
    tier: str = SOFT,
    label: str | None = None,
    null_ok: bool = True,
) -> Rule:
    """Mirrors the reference's allowed-set rules (`input_type_invalid`,
    `stop_type_invalid` — core_models.py:252-261, 426-438)."""
    c = F.col(col)
    vals = list(values)
    bad = ~c.isin(vals)
    if null_ok:
        pred = _safe(c.isNotNull() & bad)
    else:
        pred = _safe(c.isNull() | bad)
    label = label or f"{col}_invalid"
    return Rule(
        name=label,
        tier=tier,
        predicate=pred,
        message=_labeled(label, c),
        invalid_key=col,
        expected=f"one of {sorted(map(str, vals))}",
    )


def bounds(
    col: str,
    default_min: float,
    default_max: float,
    overrides: Mapping[str, tuple[float, float]] | None = None,
    key_col: str | None = None,
    tier: str = SOFT,
    missing_label: str | None = None,
) -> list[Rule]:
    """Bounds with per-key overrides — the audio translation of the
    reference's rt bounds with per-task overrides (core_models.py:
    169-202: defaults 100/10000ms, `matrix-reasoning` 300/60000 etc.).

    Emits three rules in reference order: missing, under-min, over-max.
    The override lookup compiles to a `when` chain (no join, stays in
    codegen; override maps are small static config, never data-sized).
    """
    c = F.col(col)
    min_expr: Column = F.lit(float(default_min))
    max_expr: Column = F.lit(float(default_max))
    if overrides and key_col:
        k = F.col(key_col)
        for key, (lo, hi) in overrides.items():
            min_expr = F.when(k == key, F.lit(float(lo))).otherwise(min_expr)
            max_expr = F.when(k == key, F.lit(float(hi))).otherwise(max_expr)
    rules = []
    if missing_label is not None:
        rules.append(
            Rule(
                name=missing_label,
                tier=tier,
                predicate=c.isNull(),
                message=F.lit(missing_label),
                invalid_key=col,
                expected="non-null numeric",
            )
        )
    rules.append(
        Rule(
            name=f"{col}_under_min",
            tier=tier,
            predicate=_safe(c.isNotNull() & (c < min_expr)),
            message=_labeled(f"{col}_under_min", c),
            invalid_key=col,
            expected=f">= {default_min} (per-{key_col} overrides apply)",
        )
    )
    rules.append(
        Rule(
            name=f"{col}_over_max",
            tier=tier,
            predicate=_safe(c.isNotNull() & (c > max_expr)),
            message=_labeled(f"{col}_over_max", c),
            invalid_key=col,
            expected=f"<= {default_max} (per-{key_col} overrides apply)",
        )
    )
    return rules


def regex_format(
    col: str, pattern: str, tier: str = SOFT, label: str | None = None
) -> Rule:
    """Mirrors the BCP-47 format rule `invalid_language_format(v)`
    (core_models.py:860-869)."""
    c = F.col(col)
    label = label or f"invalid_{col}_format"
    return Rule(
        name=label,
        tier=tier,
        predicate=_safe(c.isNotNull() & ~c.rlike(pattern)),
        message=_labeled(label, c),
        invalid_key=col,
        expected=f"match {pattern}",
    )


def required_when(
    col: str,
    condition: Column,
    label: str | None = None,
    tier: str = SOFT,
    expected: str = "non-null value when condition holds",
) -> Rule:
    """Conditional completeness: `col` must be present whenever
    `condition` holds (the 'if codec is lossless then bytes must
    carry a seekable container' family — the reference expresses
    these as branchy validators, e.g. the survey-scope checks that
    only apply to child runs). NULL conditions never fire (null-safe
    like every predicate here)."""
    label = label or f"{col}_required_conditionally"
    return Rule(
        name=label,
        tier=tier,
        predicate=_safe(condition & F.col(col).isNull()),
        message=F.lit(label),
        invalid_key=col,
        expected=expected,
    )
