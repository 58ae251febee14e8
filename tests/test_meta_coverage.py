"""Rule/oracle lockstep meta-check (round-3 verdict task 7).

The engine surface is 115 oracle queries across 40+ modules; silent
coverage drift — a public operator landing with neither an oracle
gate nor a pytest — is now the main regression risk. This test
enumerates every PUBLIC top-level callable defined in the operator
modules, the rules package, the scalar-function library, and the
audio/streaming/plans tiers, and asserts each one is referenced by
name from at least one gate surface:

  * `__spark_entry__.py` (oracle-gated queries), or
  * any `tests/test_*.py` other than this file, or
  * another engine module (internal composition — e.g. a helper that
    a gated operator calls is transitively gated).

It fails with the exact list of orphaned names, so adding an
operator without a gate breaks CI immediately.
"""

from __future__ import annotations

import importlib
import inspect
import pathlib
import pkgutil
import re

import data_validator_spark.operators as ops_pkg

REPO = pathlib.Path(__file__).resolve().parent.parent

GATED_PACKAGES = [
    "data_validator_spark.operators",
    "data_validator_spark.rules",
    "data_validator_spark.functions",
    "data_validator_spark.audio",
    "data_validator_spark.streaming",
    "data_validator_spark.plans",
    "data_validator_spark.sources",
]


def _public_names() -> dict[str, list[str]]:
    """name -> [module, ...] for every public top-level function/class
    DEFINED in (not re-exported into) a gated package module."""
    out: dict[str, list[str]] = {}
    for pkg_name in GATED_PACKAGES:
        pkg = importlib.import_module(pkg_name)
        for info in pkgutil.iter_modules(pkg.__path__):
            mod = importlib.import_module(f"{pkg_name}.{info.name}")
            for name, obj in vars(mod).items():
                if name.startswith("_"):
                    continue
                if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                    continue
                if getattr(obj, "__module__", None) != mod.__name__:
                    continue
                out.setdefault(name, []).append(mod.__name__)
    return out


def _gate_text() -> str:
    parts = [(REPO / "__spark_entry__.py").read_text()]
    for p in sorted((REPO / "tests").glob("test_*.py")):
        if p.name == "test_meta_coverage.py":
            continue
        parts.append(p.read_text())
    parts.append((REPO / "job.py").read_text())
    return "\n".join(parts)


def _engine_text(exclude_module: str) -> str:
    """All engine source EXCEPT the module that defines the name —
    a name only mentioned in its own module is not composed anywhere."""
    parts = []
    mod_path = exclude_module.replace(".", "/") + ".py"
    for p in sorted((REPO / "data_validator_spark").rglob("*.py")):
        if str(p.relative_to(REPO)) == mod_path:
            continue
        parts.append(p.read_text())
    return "\n".join(parts)


def _used_in_own_module(name: str, module: str) -> bool:
    """True if the defining module CALLS/uses the name beyond its own
    def/class line — a helper consumed by a gated sibling in the same
    file is transitively gated."""
    p = REPO / (module.replace(".", "/") + ".py")
    pat = re.compile(r"\b" + re.escape(name) + r"\b")
    defpat = re.compile(rf"^\s*(def|class)\s+{re.escape(name)}\b")
    for line in p.read_text().splitlines():
        if defpat.match(line):
            continue
        if pat.search(line):
            return True
    return False


def test_every_public_operator_is_gated():
    gate = _gate_text()
    orphans = []
    engine_cache: dict[str, str] = {}
    for name, modules in sorted(_public_names().items()):
        pat = re.compile(r"\b" + re.escape(name) + r"\b")
        if pat.search(gate):
            continue
        # internal composition: referenced from another engine module
        # that is itself gate-reachable (transitively gated)
        composed = False
        for m in modules:
            text = engine_cache.setdefault(m, _engine_text(m))
            if pat.search(text) or _used_in_own_module(name, m):
                composed = True
                break
        if not composed:
            orphans.append(f"{name} ({', '.join(modules)})")
    assert not orphans, (
        "public operators with no oracle query, pytest, or internal "
        "composition gate:\n  " + "\n  ".join(orphans)
    )


def test_every_oracle_query_exists_in_queries():
    """oracle_sql() keys must be a subset of queries() keys — an SQL
    oracle with no Spark-side query can never be compared."""
    import __spark_entry__ as entry

    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracle_sql keys missing from queries(): {sorted(o - q)}"
    # and the flagship set stays non-trivial
    assert len(q) >= 115
