"""Named-query registry — the contract surface for the driver harness.

Every operator family from SURVEY.md §2 registers one or more named
queries here. Each query is a PySpark callable ``(spark, sf_dir) ->
DataFrame`` plus (where SQL-expressible) an ANSI-SQL oracle string that
DuckDB runs over the same parquet for a row-count + schema +
value-hash differential check.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name
before hashing).

Float discipline: aggregates over doubles are computed in DECIMAL
(exact, order-insensitive) and final-cast to DOUBLE on BOTH sides, so
hashes match bit-for-bit regardless of partial-aggregation order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a named query with an optional DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import ent_fins_lakehouse_spark.plans.relational  # noqa: F401
    import ent_fins_lakehouse_spark.plans.lakehouse_queries  # noqa: F401
    import ent_fins_lakehouse_spark.plans.streaming_queries  # noqa: F401
    import ent_fins_lakehouse_spark.plans.llm_queries  # noqa: F401
    import ent_fins_lakehouse_spark.plans.ml_queries  # noqa: F401
    import ent_fins_lakehouse_spark.plans.geo_queries  # noqa: F401


def queries_map() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
