"""Central query registry.

Every operator/query claimed from SURVEY.md §2 registers here with
(a) a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(b) when SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables. The driver's correctness gate compares the two
(row-count + schema + order-insensitive value hash).

Determinism contract for every registered query:
- alias every computed column identically in Spark and oracle SQL;
- round derived doubles (``round(x, 2..6)``) on BOTH sides;
- never output raw event-time at sub-µs precision (events.ts is ns in
  parquet; oracles must ``CAST(ts AS TIMESTAMP)`` to µs);
- break all ordering/top-k ties with a unique key column.
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
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    bench: bool = False  # part of the bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation + its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), bench)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: s.fn for n, s in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {n: s for n, s in REGISTRY.items() if s.bench}


_LOADED = False


def _load_all() -> None:
    """Import all plan modules so their @query decorators run."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics,
        behavior,
        corpus,
        datapipe,
        matchrec,
        predicates,
        relational,
        stream_parity,
        subqueries,
        temporal,
        tpch,
    )

    _LOADED = True
