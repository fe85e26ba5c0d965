"""Query registry — the contract surface.

Every operator from SURVEY.md §2 registers itself here with an optional
DuckDB oracle twin. ``__spark_entry__.py`` exposes the registry to the driver
(`queries()` / `oracle_sql()`), and the pytest parity harness iterates it.

Discipline enforced by convention (SURVEY.md §1 gotchas):
- every computed/aggregate column is aliased identically in Spark and SQL;
- floating aggregates are rounded in BOTH dialects;
- event timestamps are truncated/formatted, never emitted raw;
- divisions are guarded with nullif in BOTH dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Register an operator as a `queries()` entry (and its oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
