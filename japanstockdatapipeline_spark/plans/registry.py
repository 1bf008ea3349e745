"""Query registry: one place that binds (name, Spark plan, DuckDB oracle).

`__spark_entry__.queries()` / `oracle_sql()`, the pytest oracle
suite, and bench.py all iterate this registry, so an operator is
"done" exactly when it is registered here with a passing oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}


def query(
    name: str, *, oracle: Optional[str] = None, doc: str = "", tags: tuple = (), bench: bool = False
):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc, tags, bench)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(sorted(_REGISTRY.items()))
