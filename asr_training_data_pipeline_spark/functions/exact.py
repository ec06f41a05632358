"""Exact (order-insensitive) aggregation helpers.

Floating-point sums are not associative, so ``sum(double)`` differs in
its last bits between engines (and between Spark runs with different
partitioning!). For aggregate columns that must be reproducible —
anything an oracle or a downstream consumer hash-compares — route the
sum through a fixed-scale decimal: double arithmetic inside the row
expression is IEEE-deterministic, the cast to ``decimal(27,6)`` is a
deterministic rounding, and decimal summation is exact and therefore
order-insensitive. Cast back to double at the end for a stable,
engine-independent result.

This costs a few % over a raw double sum and buys run-to-run
reproducibility at any partition count — the right trade for a
100 TB pipeline where results feed dedup decisions and audits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6 keeps micro-precision; precision 27 leaves 21 integer digits
# of headroom for the running sum before Spark widens further.
_DEC = "decimal(27,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive sum of a double expression via exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive mean: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`dsum` for oracle SQL strings."""
    return f"cast(sum(cast(({expr}) as decimal(27,6))) as double)"


def davg_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"cast(sum(cast(({expr}) as decimal(27,6))) as double)"
        f" / count({expr})"
    )
