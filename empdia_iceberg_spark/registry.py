"""Query registry: every declared operator from SURVEY.md §2 registers a
(name, spark_callable, duckdb_oracle_sql) triple here.

``__spark_entry__.py`` exposes the registry to the driver:
``queries()[name](spark, sf_dir) -> DataFrame`` and
``oracle_sql()[name] -> str`` (omitted for rows-only ops).

Discipline enforced by convention (SURVEY §7 slice 1 pitfalls):
- alias every computed column identically in Spark and SQL;
- round floating aggregates so order-insensitive value hashes are stable;
- timestamps rendered with an explicit format when they appear in output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    doc: str = ""


def register(name: str, oracle: Optional[str] = None, doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def promote(first: list[str]) -> None:
    """Reorder the registry so ``first`` (in order) precedes everything else.

    The driver's per-round CORRECTNESS sweep checks the first ~50
    registered queries; with ~258 registered, rotation is required so no
    query goes two rounds without driver evidence. ``__init__.py`` calls
    this once after all modules register, with the current round's
    priority list: (1) queries with no driver row yet, (2) queries whose
    implementation changed this round, (3) the half not swept last round.
    Unknown names are an error — they mean the rotation list is stale.
    """
    unknown = [n for n in first if n not in _REGISTRY]
    if unknown:
        raise KeyError(f"promote(): unregistered query names {unknown}")
    rest = [n for n in _REGISTRY if n not in set(first)]
    reordered = {n: _REGISTRY[n] for n in list(first) + rest}
    _REGISTRY.clear()
    _REGISTRY.update(reordered)


def specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}
