"""Bounded-block scaffolding for the exact all-pairs operators.

The exact-pair ground-truth operators (``dedup.jaccard_pairs_blocked``,
``similarity.cosine_pairs_blocked``) compare every pair of rows that
share a blocking key. That is quadratic in the block size by
definition — acceptable for a ground-truth/audit tool, a scale-killer
if a block grows unbounded at 100 TB. This module makes the bound a
*contract enforced by code* instead of a docstring:

- ``max_block_size`` caps how many rows of one block a single join
  cell may hold. Oversized blocks are either rejected
  (``on_oversize="raise"``) or **triangle hash-sub-sharded**
  (``on_oversize="subshard"``): rows are hashed into
  ``s = ceil(n / cap)`` shards and the block's pair space is covered
  by the s·(s+1)/2 shard-pair cells ``(p, q), p ≤ q`` — side A
  carries shard p, side B shard q. Every unordered pair lands in
  exactly one cell, so the result is **bit-identical to the unsharded
  join** while no single join cell ever matches more than ~cap² pairs.
  (This bounds per-task memory/skew, not total work — exact all-pairs
  work is inherently quadratic, which is what the guard below is for.)
- ``max_total_pairs`` is the routing guard: a cheap block census
  (count per key on the already-narrow projection) estimates the total
  intra-block pair count, and if it exceeds the cap the operator
  refuses with a pointer to the sub-quadratic path
  (``minhash_lsh_pairs`` / ``simhash_pairs`` for text,
  ``similarity_join_lsh`` / IVF for embeddings). Exact all-pairs
  beyond ~10⁸ pairs is no longer ground-truth tooling — it is a
  misrouted production job.

The census + oversize check run one small aggregation job eagerly at
plan-construction time (the input projection is persisted by every
caller, so the work is shared with the main query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default per-cell block bound. 10k rows → ≤ ~5·10⁷ pairs per cell,
#: comfortably one task's worth of work.
DEFAULT_MAX_BLOCK_SIZE = 10_000

#: Default total-pair routing guard (~10⁸ exact comparisons).
DEFAULT_MAX_TOTAL_PAIRS = 100_000_000

#: Broadcast gate for vocabulary-sized dimension tables: below this
#: many distinct keys the dim side is genuinely "small" (a few hundred
#: MB at worst) and an explicit broadcast hint is safe; above it a
#: *forced* hint does not degrade — it OOMs the driver/executors
#: outright (a 100 TB web corpus has 10⁸–10⁹ distinct tokens).
DEFAULT_MAX_BROADCAST_KEYS = 2_000_000


class BlockSizeExceededError(ValueError):
    """A blocking key exceeds the operator's bounded-block contract.

    Raised either because a single block holds more than
    ``max_block_size`` rows under ``on_oversize="raise"``, or because
    the census projects more than ``max_total_pairs`` exact
    comparisons. The fix is not a bigger cap: route the workload to
    the sub-quadratic operators (MinHash/SimHash LSH for text,
    LSH/IVF similarity for embeddings) and keep the exact-pair path
    for bounded audit samples.
    """


#: Memoized census results keyed by (semantic plan hash, key column).
#: A repeated serving call over the same immutable table version (same
#: logical plan) reuses the decision instead of re-running the census
#: job. Bounded FIFO so a long session over many distinct plans can't
#: grow it unboundedly; a table REWRITE under the same path yields a
#: fresh file listing only on a fresh read(), i.e. a new plan → new key.
_CENSUS_CACHE: dict[tuple[int, str], int] = {}
_CENSUS_CACHE_MAX = 256


def broadcast_if_small(
    dim: DataFrame,
    census_source: DataFrame,
    key: str,
    max_keys: int = DEFAULT_MAX_BROADCAST_KEYS,
    use_cache: bool = True,
) -> DataFrame:
    """Census-gated broadcast hint for a vocabulary-sized dimension.

    Same contract-enforcement philosophy as :func:`bounded_pair_sides`:
    a cheap ``approx_count_distinct`` census over ``census_source``
    (one small aggregation job — callers pass the already-persisted /
    already-needed side, so the scan is shared with the main query)
    decides whether ``dim`` is genuinely broadcast-small. Under the cap
    the explicit hint is kept (deterministic plan, no reliance on
    runtime statistics); over it the hint is DROPPED and
    AQE / ``autoBroadcastJoinThreshold`` picks the join strategy from
    actual observed sizes — a shuffle join degrades gracefully where a
    forced broadcast of a 10⁹-token vocabulary would OOM.

    The census is memoized per (logical-plan semantic hash, key): in a
    hot serving loop over one table version only the FIRST call pays
    the census job. Pass ``use_cache=False`` for sources whose plan is
    stable but whose data mutates in place (none of ours do — lake
    reads pin a snapshot/file list at plan time).
    """
    cache_key = None
    if use_cache:
        try:
            cache_key = (census_source.semanticHash(), key)
        except Exception:
            cache_key = None
        if cache_key is not None and cache_key in _CENSUS_CACHE:
            n = _CENSUS_CACHE[cache_key]
            return F.broadcast(dim) if n <= max_keys else dim
    n = census_source.agg(F.approx_count_distinct(key).alias("_n")).collect()[0]["_n"]
    if cache_key is not None:
        if len(_CENSUS_CACHE) >= _CENSUS_CACHE_MAX:
            _CENSUS_CACHE.pop(next(iter(_CENSUS_CACHE)))
        _CENSUS_CACHE[cache_key] = n
    return F.broadcast(dim) if n <= max_keys else dim


def bounded_pair_sides(
    t: DataFrame,
    block_cols: list[str],
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    on_oversize: str = "subshard",
    max_total_pairs: int = DEFAULT_MAX_TOTAL_PAIRS,
) -> tuple[DataFrame, DataFrame, list]:
    """Build the two sides of a bounded intra-block self-pair join.

    ``t`` must carry an ``_id`` column, the blocking columns, and any
    payload columns. Returns ``(a, b, cond)`` where
    ``a.join(b, cond)`` yields each unordered intra-block pair exactly
    once: ``a`` has ``id_a``, block cols as ``a_<c>``, payload as
    ``<c>_a``; ``b`` mirrors with ``b``. Callers must emit
    ``least(id_a, id_b) / greatest(id_a, id_b)`` (cross-shard cells
    pair shards, not ordered ids).
    """
    if on_oversize not in ("subshard", "raise"):
        raise ValueError(f"on_oversize must be 'subshard' or 'raise', got {on_oversize!r}")
    sizes = t.groupBy(*block_cols).agg(F.count("*").alias("_bn"))
    census = sizes.agg(
        F.max("_bn").alias("max_block"),
        F.sum(F.col("_bn") * (F.col("_bn") - 1) / 2).alias("total_pairs"),
    ).collect()[0]
    max_block = census["max_block"] or 0
    total_pairs = int(census["total_pairs"] or 0)
    if total_pairs > max_total_pairs:
        raise BlockSizeExceededError(
            f"exact all-pairs would compare ~{total_pairs:,} pairs "
            f"(> max_total_pairs={max_total_pairs:,}); this operator is a "
            "bounded ground-truth tool — use the sub-quadratic path "
            "(minhash_lsh_pairs / simhash_pairs for text, "
            "similarity_join_lsh / IVF for embeddings) instead."
        )
    if max_block > max_block_size:
        if on_oversize == "raise":
            raise BlockSizeExceededError(
                f"largest block holds {max_block:,} rows "
                f"(> max_block_size={max_block_size:,}); pass "
                "on_oversize='subshard' for exact triangle sub-sharding, "
                "or route to the LSH/IVF operators."
            )
        t = t.join(F.broadcast(sizes), list(block_cols)).withColumn(
            "_ns", F.ceil(F.col("_bn") / F.lit(max_block_size)).cast("int")
        )
    else:
        # every block fits one cell — keep the plan free of the census join
        t = t.withColumn("_ns", F.lit(1))
    t = t.withColumn("_shard", F.pmod(F.xxhash64("_id"), F.col("_ns")).cast("int"))
    payload = [
        c for c in t.columns if c not in (*block_cols, "_id", "_bn", "_ns", "_shard")
    ]
    a = t.select(
        F.col("_id").alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
        *[F.col(c).alias(f"{c}_a") for c in payload],
        F.col("_shard").alias("_pa"),
        F.explode(F.sequence(F.col("_shard"), F.col("_ns") - 1)).alias("_qa"),
    )
    b = t.select(
        F.col("_id").alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
        *[F.col(c).alias(f"{c}_b") for c in payload],
        F.explode(F.sequence(F.lit(0), F.col("_shard"))).alias("_pb"),
        F.col("_shard").alias("_qb"),
    )
    cond = (
        [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols]
        + [F.col("_pa") == F.col("_pb"), F.col("_qa") == F.col("_qb")]
        # diagonal cells hold the same shard on both sides: order by id;
        # off-diagonal cells pair two disjoint shards: every match is a
        # distinct unordered pair already.
        + [(F.col("_pa") < F.col("_qa")) | (F.col("id_a") < F.col("id_b"))]
    )
    return a, b, cond
