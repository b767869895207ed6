"""Data skipping: per-data-dir column statistics + predicate pruning.

The Delta mechanism (`Instructor/01-Fraud-Delta.py:287-289` names file
compaction and Z-ORDER; their payoff IS data skipping): every commit
stores min/max per column for each data directory it adds, and reads/
DML prune directories whose [min, max] range cannot satisfy the
predicate — metadata-only, no data I/O for pruned dirs. `OPTIMIZE …
ZORDER BY` tightens the per-dir ranges, which is what makes the stats
selective.

Pruning understands conjunctions of ``col <op> literal`` (op ∈
=, <, <=, >, >=, and col BETWEEN a AND b as two comparisons). Anything
it cannot parse disables pruning for that predicate — skipping is an
optimization and must NEVER change results.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: stat-eligible column types (orderable, JSON-serializable)
_STATS_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
)


def collect_stats(df: DataFrame) -> dict:
    """One aggregation pass over a (just-written) data dir:
    {col: [min, max]} for stat-eligible columns."""
    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, _STATS_TYPES)]
    if not cols:
        return {}
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"mn_{c}"))
        aggs.append(F.max(c).alias(f"mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        if mn is not None:
            out[c] = [mn, mx]
    return out


_CMP = re.compile(
    r"^\s*(\w+)\s*(<=|>=|=|<|>)\s*('(?:[^']*)'|-?\d+(?:\.\d+)?)\s*$"
)
_BETWEEN = re.compile(
    r"(\w+)\s+BETWEEN\s+('(?:[^']*)'|-?\d+(?:\.\d+)?)\s+AND\s+('(?:[^']*)'|-?\d+(?:\.\d+)?)",
    re.IGNORECASE,
)


def _lit(tok: str):
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def parse_conjuncts(predicate: str) -> list[tuple[str, str, object]] | None:
    """Parse ``a = 1 AND b < 'x' AND c BETWEEN 0 AND 9`` into
    (col, op, literal) triples. Returns None when any conjunct is not
    understood (caller must then skip pruning)."""
    # rewrite BETWEEN first — its inner AND would confuse the
    # conjunct split below
    pred = _BETWEEN.sub(r"\1 >= \2 AND \1 <= \3", predicate.strip())
    out: list[tuple[str, str, object]] = []
    for part in re.split(r"\s+AND\s+", pred, flags=re.IGNORECASE):
        m = _CMP.match(part)
        if m:
            out.append((m.group(1), m.group(2), _lit(m.group(3))))
            continue
        return None
    return out or None


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _comparable(lit, lo, hi) -> bool:
    # NaN bounds make the range meaningless: Spark's max() returns NaN
    # when any value is NaN and Spark SQL orders NaN above everything,
    # while Python's nan comparisons are all False — treating such a
    # range as "no stats" keeps pruning sound.
    if _is_nan(lo) or _is_nan(hi):
        return False
    return isinstance(lit, str) == isinstance(lo, str)


def range_may_match(conjuncts: list[tuple[str, str, object]], stats: dict) -> bool:
    """Can a dir with these [min,max] ranges contain a matching row?
    Missing stats for a column → assume yes (never unsound)."""
    for col, op, lit in conjuncts:
        rng = stats.get(col)
        if not rng:
            continue
        lo, hi = rng
        if lo is None or hi is None or not _comparable(lit, lo, hi):
            continue
        if op == "=" and not (lo <= lit <= hi):
            return False
        if op == "<" and not (lo < lit):
            return False
        if op == "<=" and not (lo <= lit):
            return False
        if op == ">" and not (hi > lit):
            return False
        if op == ">=" and not (hi >= lit):
            return False
    return True


def prune_dirs(
    predicate: str | None, dir_stats: dict[str, dict], dirs: list[str]
) -> tuple[list[str], list[str]]:
    """Split dirs into (candidates, pruned) for the predicate using
    stored stats. Unparseable predicate or missing stats → everything
    is a candidate."""
    if not predicate:
        return dirs, []
    conjuncts = parse_conjuncts(predicate)
    if conjuncts is None:
        return dirs, []
    cand, pruned = [], []
    for d in dirs:
        st = dir_stats.get(d)
        if st is None or range_may_match(conjuncts, st):
            cand.append(d)
        else:
            pruned.append(d)
    return cand, pruned
