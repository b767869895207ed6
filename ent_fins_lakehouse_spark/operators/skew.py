"""Skew-mitigation operators.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on in our
session) repairs sort-merge joins after the fact; these helpers are for
the cases AQE can't fix:

- a hot key so large that even a split partition's build side must be
  replicated → :func:`salted_join`
- per-key top-k where one key owns a double-digit share of the table
  and a single window reducer becomes the straggler →
  :func:`topk_per_key_salted`

Salting trades one extra narrow column (and for the join, an
``explode`` replication of the small side by ``num_salts``) for an
even spread of the hot key across ``num_salts`` reducers. Results are
identical to the unsalted plan — asserted property-style in
tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over
    ``num_salts`` partitions and the RIGHT side replicated to every
    salt (explode of a literal range — no extra shuffle of the right
    beyond the join's own).

    Use when the right side is too big to broadcast but small enough
    to replicate ``num_salts``×; correctness is identical to
    ``left.join(right, on, how)`` for inner/left joins (each left row
    carries exactly one salt, each right row exists once per salt, so
    every matching pair meets exactly once).

    The salt is derived from a hash of the whole left row (crc32 of
    the concatenated key + a uniform component from ``rand`` would
    break determinism; ``pmod(hash(*non_key_cols), n)`` keeps re-runs
    stable), falling back to ``spark_partition_id`` when the left has
    no non-key columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    non_key = [c for c in left.columns if c not in on]
    salt_src = (
        F.hash(*[F.col(c) for c in non_key]) if non_key else F.spark_partition_id()
    )
    l_s = left.withColumn(SALT, F.pmod(salt_src, F.lit(num_salts)))
    r_s = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return l_s.join(r_s, [*on, SALT], how).drop(SALT)


def topk_per_key_salted(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    num_salts: int = 16,
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per key, skew-safely: phase 1 takes the top-k within
    each (key, salt) sub-partition — ``num_salts`` parallel reducers
    share each hot key — phase 2 re-ranks the ≤ k·num_salts survivors
    per key. Equivalent to one global window rank (dense ties aside:
    both phases use ``row_number``, so exactly k rows per key with
    deterministic (order_col, salt-local) tie-breaks)."""
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    salted = df.withColumn(SALT, F.pmod(F.hash(F.col(order_col)), F.lit(num_salts)))
    w1 = W.partitionBy(*keys, SALT).orderBy(order)
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", SALT)
    )
    w2 = W.partitionBy(*keys).orderBy(order)
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
