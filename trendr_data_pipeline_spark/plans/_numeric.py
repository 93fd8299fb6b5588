"""Numeric-determinism helpers for oracle-comparable aggregates.

Floating-point sums depend on accumulation order; Spark's partial
aggregation order differs run-to-run and from DuckDB's. For any sum
over more than a handful of doubles we therefore accumulate in exact
DECIMAL and cast the final value to DOUBLE — bit-identical in both
engines. The per-row double expression feeding the cast is evaluated
identically (IEEE 754 ops are deterministic given the same expression
tree), so the DECIMAL quantization sees identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scale used for exact decimal accumulation (fits 1e12 totals at 1e-6 grain)
DEC = "decimal(28,6)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive sum of a double column, returned as DOUBLE.

    Oracle-side equivalent: ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-insensitive mean: exact decimal sum divided by count.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr})"
