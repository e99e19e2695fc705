"""Oracle-checked query registry — the engine's public query surface.

Every implemented operator gets a ``@query(name, sql=...)`` entry: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the equivalent
DuckDB SQL run by the driver's correctness harness. Column names/aliases are
kept identical on both sides because the harness hashes values after sorting
columns BY NAME.

Determinism rules (SURVEY.md §7.4):
- every sort emits an explicit rank column computed with full tiebreaker keys
  so order survives the order-insensitive hash;
- floating-point aggregates are computed on DECIMAL (exact, order-independent)
  then cast back to DOUBLE so Spark's and DuckDB's summation order can't
  diverge in the low bits.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (import-for-side-effect)."""
    global _LOADED
    if _LOADED:
        return
    from .suites import (  # noqa: F401
        behavior,
        core_sort,
        decontam,
        events,
        multimodal,
        relational,
        sampling,
        skewq,
        text_dedup,
        vectors,
    )

    _LOADED = True
