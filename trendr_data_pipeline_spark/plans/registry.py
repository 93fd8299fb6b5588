"""Query registry backing the driver contract (``__spark_entry__``).

Each entry pairs a Spark plan builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- double aggregations over many rows go through exact DECIMAL
  accumulation then a final cast to DOUBLE (summation order must not
  leak into the hash);
- libm-derived per-row doubles (exp/tanh/log) are rounded to a fixed
  scale on both sides (JVM vs C libm may differ in the last ulp).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible (driver does rows-only check)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    from . import load_all

    load_all()
    return dict(_REGISTRY)
