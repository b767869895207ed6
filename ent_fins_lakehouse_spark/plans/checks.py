"""Shared in-plan assertion helpers for query fixtures.

Multiset (bag) equality between two DataFrames used to be asserted as
``got.exceptAll(want) ∪ want.exceptAll(got)`` — correct, but each
``exceptAll`` evaluates BOTH inputs, so the pair costs four evaluations
of subtrees that are often a full recompute join or a lakehouse log
replay (guide §1.2: don't compute things twice). The helpers here do
ONE aggregation per side and join the per-row-image multiplicities,
which is zero-mismatches exactly when the two bags are equal.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multiset_mismatch(a: DataFrame, b: DataFrame) -> DataFrame:
    """Rows (images) whose multiplicity differs between ``a`` and ``b``.

    One groupBy-count per side + a null-safe full outer join on the
    row image; empty iff the two DataFrames are multiset-equal. NaN
    and NULL group/join consistently on both paths (Spark normalizes
    NaN in grouping and ``eqNullSafe`` matches NULLs), so this agrees
    with ``exceptAll``'s bag semantics while evaluating each input
    once instead of twice."""
    cols = a.columns
    ac = a.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n_left")).alias("l")
    bc = b.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n_right")).alias("r")
    cond = functools.reduce(
        lambda x, y: x & y,
        [F.col(f"l.`{c}`").eqNullSafe(F.col(f"r.`{c}`")) for c in cols],
    )
    return ac.join(bc, cond, "full_outer").filter(
        ~F.col("_n_left").eqNullSafe(F.col("_n_right"))
    )


def multiset_diff_count(a: DataFrame, b: DataFrame) -> int:
    """Number of distinct row images with differing multiplicity —
    0 iff ``a`` and ``b`` are equal as multisets (one Spark job)."""
    return multiset_mismatch(a, b).count()


def multiset_equal_col(a: DataFrame, b: DataFrame, name: str) -> DataFrame:
    """LAZY variant: a 1-row DataFrame with boolean column ``name``,
    true iff ``a`` and ``b`` are multiset-equal — for queries that fold
    the check into their returned plan instead of asserting eagerly."""
    return multiset_mismatch(a, b).agg(
        (F.count(F.lit(1)) == 0).alias(name)
    )
