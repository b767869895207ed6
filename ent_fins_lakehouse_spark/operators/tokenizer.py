"""Distributed BPE tokenizer training/encoding (Sennrich et al. 2016).

The scalable formulation: all corpus-sized work is ONE word-count
shuffle; the iterative merge loop then runs over the DISTINCT-word
table (vocabulary-sized — ~10^5-10^6 rows even at 100 TB) with
frequency weights. Each iteration is: a vocabulary-sized pair count
(JVM explode + hash agg), a single-row driver collect (the argmax
merge), and a vocabulary-sized rewrite of the words that contain the
pair (Arrow-batched pandas UDF — the sequential left-to-right merge
scan is not expressible with built-in array functions). State between
iterations is localCheckpointed so 10-50 merges don't stack a
10-50-deep lineage.

The reference corpus has no tokenizer (Databricks notebooks); this is
part of the LLM-data-pipeline extension surface (driver brief
"north_star").
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

END_OF_WORD = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) — the frequency-weighted distinct-word table
    with initial symbol sequences (chars + the end-of-word marker).
    The ONLY corpus-sized pass in BPE training."""
    return (
        docs.select(F.explode(F.split(F.lower(text_col), "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms",
            F.concat(
                F.split("w", ""),  # chars
                F.array(F.lit(END_OF_WORD)),
            ),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies, weighted by word count —
    pure JVM higher-order expression, vocabulary-sized."""
    return (
        # fully-merged single-symbol words carry no pairs — and MUST be
        # filtered: sequence(1, 0) counts DOWN in Spark and would index
        # out of bounds
        vocab.filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] AS l, syms[i] AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("freq"))
    )


def _merge_pair_udf(left: str, right: str):
    """Rewrite symbol arrays, replacing each adjacent (left, right)
    with the merged symbol — the standard left-to-right single-pass
    merge (non-overlapping, e.g. merging (a,a) in 'aaa' gives
    ['aa','a'])."""
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def apply(s: pd.Series) -> pd.Series:
        def one(syms):
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return s.map(one)

    return apply


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[dict]:
    """Learn ``n_merges`` BPE merge rules. Returns
    ``[{"rank", "left", "right", "freq"}, ...]`` in merge order.
    Deterministic: argmax ties break on (left, right) lexicographic."""
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )  # ONE row to the driver per iteration — bounded by design
        if not top or top[0]["freq"] <= 1:
            break
        l, r, freq = top[0]["l"], top[0]["r"], int(top[0]["freq"])
        merges.append({"rank": rank, "left": l, "right": r, "freq": freq})
        has_pair = (F.size("syms") >= 2) & F.expr(
            "exists(sequence(1, size(syms) - 1), "
            f"i -> syms[i-1] = '{l}' AND syms[i] = '{r}')"
        )  # size guard: sequence(1, 0) counts DOWN (see _pair_counts)
        vocab = vocab.withColumn(
            "syms",
            F.when(has_pair, _merge_pair_udf(l, r)(F.col("syms"))).otherwise(
                F.col("syms")
            ),
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode_vocab(
    docs: DataFrame, merges: list[dict], text_col: str = "text"
) -> DataFrame:
    """(word, cnt, tokens) — every distinct corpus word encoded by the
    learned merge table, applied in rank order inside ONE Arrow batch
    pass over the vocabulary (the corpus itself is never re-tokenized:
    token-level corpus statistics join this table back on the word)."""
    ranked = [(m["left"], m["right"]) for m in sorted(merges, key=lambda m: m["rank"])]

    @F.pandas_udf(ArrayType(StringType()))
    def encode(s: pd.Series) -> pd.Series:
        def one(syms):
            syms = list(syms)
            for left, right in ranked:
                if left not in syms or right not in syms:
                    continue
                out = []
                i, n = 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return s.map(one)

    return word_vocab(docs, text_col).withColumn("tokens", encode(F.col("syms"))).drop(
        "syms"
    )
