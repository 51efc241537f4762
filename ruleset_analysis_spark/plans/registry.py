"""Query registry — the single source of truth for the graded surface.

Every operator module registers ``QuerySpec`` entries; the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``) and the
bench/test harnesses are all thin views over this dict, so a query can
never be declared to the driver without its oracle and tests seeing it
too (SURVEY.md §2 is the binding inventory).

Conventions enforced here by construction:

* each builder takes ``(spark, sf_dir)`` and returns a *lazy* DataFrame
  (no action inside builders);
* every computed column is aliased identically in the DataFrame code
  and the oracle SQL (the driver sorts columns by name before hashing);
* ``oracle=None`` marks a rows-only query (hash-unstable or
  non-SQL-expressible semantics) — the driver records a weaker check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# Operator modules that register specs on import, in SURVEY §2 order.
OPERATOR_MODULES = (
    "scans",
    "scalar",
    "aggregations",
    "joins",
    "windows",
    "sorts_setops",
    "event_windows",
    "firewall",
    "text_analysis",
    "dedup",
    "similarity",
    "multimodal",
    "udfs",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    builder: Builder
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())

    @property
    def rows_only(self) -> bool:
        return self.oracle is None


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    category: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a builder under ``name`` with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            category=category,
            builder=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or "").strip(),
            tags=tuple(tags),
        )
        return fn

    return deco


def _load_modules() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in OPERATOR_MODULES:
        importlib.import_module(f"ruleset_analysis_spark.operators.{mod}")
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load_modules()
    return dict(_REGISTRY)


def queries_dict() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_dict() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
