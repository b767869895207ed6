"""Salted operators must be result-identical to their unsalted
equivalents — skew handling is a physical rewrite, never a semantic
one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%), many cold keys
    return spark.createDataFrame(
        [(("hot" if i % 10 else f"cold{i}"), i, float(i % 97)) for i in range(2000)],
        "k STRING, rid LONG, v DOUBLE",
    )


@pytest.fixture(scope="module")
def dim(spark):
    keys = ["hot"] + [f"cold{i}" for i in range(0, 2000, 10)]
    return spark.createDataFrame(
        [(k, len(k)) for k in keys], "k STRING, klen INT"
    )


def test_salted_join_inner_equals_plain(skewed, dim):
    from ent_fins_lakehouse_spark.operators.skew import salted_join

    plain = {(r["rid"], r["klen"]) for r in skewed.join(dim, "k").collect()}
    salted = {(r["rid"], r["klen"]) for r in salted_join(skewed, dim, ["k"]).collect()}
    assert salted == plain and plain


def test_salted_join_left_keeps_unmatched(spark, dim):
    from ent_fins_lakehouse_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [("hot", 1), ("nokey", 2)], "k STRING, rid LONG"
    )
    got = {r["rid"]: r["klen"] for r in salted_join(left, dim, ["k"], how="left").collect()}
    assert got == {1: 3, 2: None}


def test_topk_per_key_salted_equals_window(skewed):
    from ent_fins_lakehouse_spark.operators.skew import topk_per_key_salted
    from pyspark.sql import Window as W

    # rid is unique → no ties → both formulations are deterministic
    got = {
        (r["k"], r["rid"])
        for r in topk_per_key_salted(skewed, ["k"], "rid", k=5).collect()
    }
    w = W.partitionBy("k").orderBy(F.desc("rid"))
    want = {
        (r["k"], r["rid"])
        for r in skewed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .collect()
    }
    assert got == want and len(got) > 5
