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

Integer discipline: every integer aggregate in an oracle is wrapped in
``CAST(... AS BIGINT)``. DuckDB's SUM over integers returns HUGEINT
(int128), a type Spark never produces and that the driver's
pandas/Arrow hash bridge degrades to float64 — so an oracle with
bit-identical VALUES still hash-FAILs on type (r10: q126/q129). In a
UNION ALL every branch must be cast: BIGINT ∪ HUGEINT re-promotes to
HUGEINT. Enforced by tools/oracle_census.py (zero HUGEINT-class
columns across all oracles) and the type-faithful check in
tools/driver_sim.py; both are pinned by tests/test_type_faithful.py.
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


def _manifest():
    """The generated pure-data manifest (tools/gen_manifest.py), or
    None when absent — callers then fall back to eager loading."""
    try:
        from ent_fins_lakehouse_spark.plans import _manifest as m
    except ImportError:
        return None
    return m


def _lazy_fn(name: str, module: str) -> SparkQuery:
    """A callable that imports the defining plan module on FIRST
    invocation (the decorator registration then supplies the real fn).
    Keeps registry/driver startup O(1) in registered queries instead of
    paying the full ~22k-LoC plan-module import up front."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spec = QUERIES.get(name)
        if spec is None:
            import importlib

            importlib.import_module(module)
            spec = QUERIES[name]
        return spec.fn(spark, sf_dir)

    run.__name__ = name
    run.__qualname__ = name
    return run


def queries_map() -> dict[str, SparkQuery]:
    m = _manifest()
    if m is None:
        _load_all()
        return {name: spec.fn for name, spec in QUERIES.items()}
    out: dict[str, SparkQuery] = {
        name: _lazy_fn(name, module) for name, module in m.MODULES.items()
    }
    # safety net for a stale manifest: queries whose module is already
    # imported still surface (tests/test_registry_manifest.py makes
    # staleness a hard failure, so this only papers over the window
    # between adding a query and regenerating)
    for name, spec in QUERIES.items():
        if name not in out:
            out[name] = spec.fn
    return out


def oracle_sql_map() -> dict[str, str]:
    m = _manifest()
    if m is None:
        _load_all()
        return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
    out = dict(m.ORACLES)
    for name, spec in QUERIES.items():  # stale-manifest safety net
        if spec.oracle is not None:
            out[name] = spec.oracle
    return out
