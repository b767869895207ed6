"""Oracle-stable numeric aggregation helpers.

Summing doubles is order-dependent: Spark's partial/final aggregation
and DuckDB's sequential scan sum in different orders and disagree in
the last bits, which breaks a bit-exact value-hash comparison. Fix:
cast to DECIMAL first (exact, associative, order-insensitive), sum in
decimal, cast the final result back to DOUBLE. Both engines convert
the same exact decimal to the same nearest double, so hashes match —
and the query still declares a plain ``double`` output schema.

A double is never exactly on a decimal half-tie (x.xxxx5 is not
representable in binary), so the double→decimal rounding direction is
also engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,4)"


def dec(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(12,{scale})")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Exact order-insensitive sum of a double column, as double."""
    return F.sum(dec(col, scale)).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB/ANSI equivalent of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive average: exact decimal sum / count, divided in
    double space (identical inputs → identical IEEE result)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def davg_sql(expr: str, scale: int = 4) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(12,{scale}))) AS DOUBLE) / COUNT({expr}))"


def money(col: Column | str) -> Column:
    """2-decimal monetary cast, sized so a 3-factor product
    (price × (1±rate) × (1±rate)) stays inside precision 38 in both
    Spark and DuckDB — no engine-specific scale reduction."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def rate(col: Column | str) -> Column:
    """2-decimal rate (discount/tax) cast."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(4,2)")


def ONE() -> Column:
    # function, not module constant: F.lit needs a live SparkContext
    return F.lit(1).cast("decimal(3,2)")

# SQL fragments for oracle strings (DuckDB side of the same casts)
MONEY_SQL = "CAST({} AS DECIMAL(12,2))"
RATE_SQL = "CAST({} AS DECIMAL(4,2))"
ONE_SQL = "CAST(1 AS DECIMAL(3,2))"


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return money("l_extendedprice") * (ONE() - rate("l_discount"))


REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def charge_expr() -> Column:
    """revenue * (1 + l_tax), exact decimal."""
    return revenue_expr() * (ONE() + rate("l_tax"))


CHARGE_SQL = REVENUE_SQL + " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"
