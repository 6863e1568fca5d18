"""Query registry: the single source of truth for the operator inventory.

Each operator module registers its queries here with an optional DuckDB
oracle SQL string; ``__spark_entry__.py`` re-exports the registry as the
driver contract (``queries()`` / ``oracle_sql()``), so adding an operator is
one ``@register(...)`` decorator — nothing else to wire.

Registration order is import order of the modules in ``load_all()``; keys
are the SURVEY.md §2 contract names.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Operator modules that self-register queries on import.
_OPERATOR_MODULES = (
    "scala_reactivex_spark.operators.creation",
    "scala_reactivex_spark.operators.stateless",
    "scala_reactivex_spark.operators.stateful",
    "scala_reactivex_spark.operators.windows",
    "scala_reactivex_spark.operators.combinators",
    "scala_reactivex_spark.operators.aggregates",
    "scala_reactivex_spark.operators.relational",
    "scala_reactivex_spark.operators.llm_dedup",
    "scala_reactivex_spark.operators.llm_similarity",
    "scala_reactivex_spark.operators.llm_text",
    "scala_reactivex_spark.operators.llm_multimodal",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None → driver runs weaker rows-only check
    tier: str = "T1"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    tier: str = "T1",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tier=tier, doc=doc or (fn.__doc__ or ""),
            tags=tags,
        )
        return fn

    return deco


def load_all() -> None:
    """Import every operator module exactly once (populates the registry)."""
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def registry() -> dict[str, QuerySpec]:
    load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {name: spec.fn for name, spec in registry().items()}


def all_oracles() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (only queries that declare one)."""
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle
    }
