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


#: per-key row-count cap above which exact interpolated percentiles
#: (which buffer every value of a key in one aggregation state) route
#: to the KLL-style percentile_approx sketch tier — constant memory at
#: any corpus size. 10M doubles ≈ 80 MB of agg state per key, the
#: practical executor ceiling.
DEFAULT_MAX_EXACT_PERCENTILE_ROWS = 10_000_000

#: memoized max-rows-per-key census keyed by the source's semantic
#: plan hash + key column (the broadcast_if_small pattern): a serving
#: loop over one immutable snapshot pays the census once
_PCT_CENSUS_CACHE: dict[tuple[int, str], int] = {}
_PCT_CENSUS_CACHE_MAX = 256


def percentile_tiered(
    df,
    key: str,
    col: Column | str,
    probs: list[float],
    max_exact_rows: int = DEFAULT_MAX_EXACT_PERCENTILE_ROWS,
    accuracy: int = 10000,
):
    """Census-gated exact→sketch percentile tier (VERDICT r7 item 7).

    Exact interpolated ``percentile`` holds every value of a group in
    one aggregation buffer — the right answer while a key's row count
    fits executor memory, and a scale cliff after. This helper runs a
    cheap census (``groupBy(key).count()`` reduced to its max — the
    shuffle is |keys| rows and shares the main query's exchange
    layout, memoized per plan like ``broadcast_if_small``) and picks
    the tier: at or under ``max_exact_rows`` per key, the exact
    aggregate (hash-stable vs ``quantile_cont``); above it,
    ``percentile_approx`` — the one-pass constant-memory KLL-style
    sketch whose rank error is n/accuracy (the q141 bound gate).

    Returns ``(limits_df, tier)`` where ``limits_df`` has one row per
    key with a ``_pct`` array column (one slot per prob) and ``tier``
    is ``"exact"`` or ``"sketch"`` so callers can assert the choice
    in-plan."""
    c = F.col(col) if isinstance(col, str) else col
    cache_key = None
    try:
        # the plan hash alone is NOT append-safe: a path-backed scan
        # keeps its semanticHash when new files land under the path,
        # and a stale "small" census would route a now-huge key to the
        # exact tier (the scale cliff the gate exists to prevent).
        # Fold the CURRENT input-file list into the key — driver-side
        # metadata, no scan — so any append/compaction re-censuses.
        cache_key = (df.semanticHash(), key, hash(tuple(sorted(df.inputFiles()))))
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _PCT_CENSUS_CACHE:
        max_rows = _PCT_CENSUS_CACHE[cache_key]
    else:
        max_rows = int(
            df.groupBy(key).count().agg(F.max("count").alias("_m")).collect()[0]["_m"]
            or 0
        )
        if cache_key is not None:
            if len(_PCT_CENSUS_CACHE) >= _PCT_CENSUS_CACHE_MAX:
                _PCT_CENSUS_CACHE.pop(next(iter(_PCT_CENSUS_CACHE)))
            _PCT_CENSUS_CACHE[cache_key] = max_rows
    if max_rows <= max_exact_rows:
        agg = F.percentile(c, F.array(*[F.lit(p) for p in probs]))
        tier = "exact"
    else:
        agg = F.percentile_approx(c, [float(p) for p in probs], accuracy)
        tier = "sketch"
    return df.groupBy(key).agg(agg.alias("_pct")), tier
