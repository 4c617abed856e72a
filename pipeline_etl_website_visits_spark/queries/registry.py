"""Query registry — the contract consumed by ``__spark_entry__.py``.

Each entry pairs a Spark DataFrame implementation (the engine under test)
with an equivalent ANSI-SQL oracle string runnable by DuckDB on the same
parquet tables. The driver hash-compares the two at sf=0.01.

Dialect rules baked into every query (SURVEY.md §2.12 "dialect traps"):
- every output column explicitly aliased, identically on both sides;
- doubles produced by arithmetic are aggregated in DECIMAL(18,2) where money
  determinism matters, then ``ROUND(CAST(x AS DOUBLE), 2)``;
- ``CAST(FLOOR(x) AS INT)`` instead of ``CAST(x AS INT)`` (DuckDB rounds,
  Spark truncates);
- counts/sums cast to BIGINT (DuckDB SUM(int) yields HUGEINT);
- LIMIT always preceded by ORDER BY over a unique key (the driver's compare
  is order-insensitive but the *set* must be deterministic);
- timestamps only ever surfaced as DATE casts or formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    certifies: str = ""  # SURVEY §2 operator row(s) this query certifies
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, certifies: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, certifies=certifies, tags=tuple(tags))
        return fn

    return deco


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
