"""Query registry (driver contract surface).

``REGISTRY[name].fn(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) ``.oracle`` — the ANSI/DuckDB SQL the driver runs
side-by-side for the correctness gate. Query-defining modules import
:func:`register`; the public accessor module (``api``) imports all of
them so the registry is fully populated.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    """One registry entry: the Spark implementation, the DuckDB oracle
    (None → driver records a rows-only check), and tags."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, bench=bench, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items() if q.bench}
