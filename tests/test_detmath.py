"""Cross-engine determinism of the detmath kernels (VERDICT r9 item 1).

The only hash mismatches ever observed in the full-registry sweep came
from two engine-divergent primitives: libm ``ln`` (1-ulp differences)
and scale-4 double ``ROUND`` (Spark rounds the decimal expansion
exactly, DuckDB multiplies by 1e4 first). These tests pin the
replacements: ``det_ln_ratio`` must be BIT-identical between Spark and
DuckDB over random integer ratios, and the quantize/mean helpers must
agree exactly on the half-boundary cases that used to flip
(e.g. a 10-token doc whose 4dp sum is -34.0085).
"""

from __future__ import annotations

import math
import random
import struct

import duckdb
import pytest

from pyspark.sql import functions as F

from ent_fins_lakehouse_spark.functions.detmath import (
    det_ln_ratio,
    det_ln_ratio_sql,
    det_mean4,
    det_mean4_sql,
    det_quantize4,
    det_quantize4_sql,
)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def pairs():
    rng = random.Random(20260815)
    out = [(rng.randint(1, b), b) for b in (rng.randint(1, 2**40) for _ in range(400))]
    # edges: unity ratio, power-of-two boundaries, extreme b, tiny a
    out += [(1, 1), (1, 2), (2, 2), (3, 4), (1, 2**62), (2**62 - 1, 2**62), (7, 1000)]
    return out


def test_det_ln_ratio_bit_identical_spark_vs_duckdb(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    srows = {
        (r["a"], r["b"]): r["v"]
        for r in df.select("a", "b", det_ln_ratio(F.col("a"), F.col("b")).alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    expr = det_ln_ratio_sql("a", "b")
    drows = {(a, b): v for a, b, v in con.execute(f"SELECT a, b, {expr} FROM t").fetchall()}
    assert srows.keys() == drows.keys()
    for k in srows:
        assert _bits(srows[k]) == _bits(drows[k]), (k, srows[k], drows[k])


def test_det_ln_ratio_accuracy(spark, pairs):
    """The truncated series is within 1e-11 of true ln — hash equality
    never depends on this, but wildly-wrong values would corrupt the
    LM-quality semantics."""
    df = spark.createDataFrame(pairs, "a long, b long")
    for r in df.select("a", "b", det_ln_ratio(F.col("a"), F.col("b")).alias("v")).collect():
        assert abs(r["v"] - math.log(r["a"] / r["b"])) < 1e-11


def test_quantize_and_mean_agree_on_half_boundaries(spark):
    """Reproduce the r9 flip case: sums that divide to an exact x.xxxx5
    half must round identically on both engines via the integer-grid
    route (they did NOT via ROUND(sum/n, 4): Spark gave -3.4008,
    DuckDB -3.4009)."""
    cases = [(-340085, 10), (-1973363, 58), (340085, 10), (25, 2), (-25, 2), (0, 7)]
    df = spark.createDataFrame(cases, "s long, n long")
    srows = {
        (r["s"], r["n"]): r["m"]
        for r in df.select("s", "n", det_mean4(F.col("s"), F.col("n")).alias("m")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s BIGINT, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    drows = {
        (s, n): m
        for s, n, m in con.execute(
            f"SELECT s, n, {det_mean4_sql('s', 'n')} FROM t"
        ).fetchall()
    }
    for k in srows:
        assert _bits(srows[k]) == _bits(drows[k]), (k, srows[k], drows[k])
    # half-away-from-zero, both signs
    assert srows[(-340085, 10)] == -3.4009
    assert srows[(340085, 10)] == 3.4009


def test_quantize4_bit_identical(spark):
    vals = [(-3.40085,), (-3.4023499999999997,), (0.0,), (1.99995,), (-1.99995,)]
    df = spark.createDataFrame(vals, "x double")
    srows = [r["q"] for r in df.select(det_quantize4(F.col("x")).alias("q")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", vals)
    drows = [v for (v,) in con.execute(f"SELECT {det_quantize4_sql('x')} FROM t").fetchall()]
    assert srows == drows


def test_det_trig_bit_identical_spark_vs_duckdb(spark):
    """det_sin / det_cos / det_asin must produce bit-identical doubles
    on Spark (Column tree, codegen) and DuckDB (SQL text) over a dense
    grid of the geo domain (|x| <= 1.9 rad; asin arg in [0, 1])."""
    import duckdb

    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.functions.detmath import (
        det_asin,
        det_asin_sql,
        det_cos,
        det_cos_sql,
        det_sin,
        det_sin_sql,
    )

    n = 4001
    grid = (F.col("id").cast("double") / F.lit(float(n - 1))) * F.lit(3.8) - F.lit(1.9)
    rows = (
        spark.range(n)
        .select(grid.alias("x"))
        .select(
            "x",
            det_sin(F.col("x")).alias("s"),
            det_cos(F.col("x")).alias("c"),
            det_asin((F.col("x") + F.lit(1.9)) / F.lit(3.8)).alias("a"),
        )
        .collect()
    )
    con = duckdb.connect()
    q = f"""
    SELECT x, {det_sin_sql('x')} AS s, {det_cos_sql('x')} AS c,
           {det_asin_sql('((x+1.9)/3.8)')} AS a
    FROM (SELECT CAST(id AS DOUBLE)/{float(n - 1)}*3.8-1.9 AS x FROM range({n}) t(id))
    """
    duck = {r[0].hex(): r[1:] for r in con.execute(q).fetchall()}
    for r in rows:
        ds, dc, da = duck[r["x"].hex()]
        assert r["s"] == ds and r["c"] == dc and r["a"] == da, r["x"]


def test_det_trig_accuracy_vs_libm(spark):
    """Truncation error bounds on the intended domain: sin/cos within
    2 ulp-ish of libm over |x| <= 1.9; asin within 1e-9 for y <= 0.4
    (the top-k nearest-neighbor regime that actually gets emitted) and
    strictly monotonic over all of [0, 1] (ordering correctness)."""
    import math

    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.functions.detmath import det_asin, det_cos, det_sin

    n = 2001
    grid = (F.col("id").cast("double") / F.lit(float(n - 1))) * F.lit(3.8) - F.lit(1.9)
    rows = (
        spark.range(n)
        .select(grid.alias("x"))
        .select(
            "x",
            det_sin(F.col("x")).alias("s"),
            det_cos(F.col("x")).alias("c"),
            det_asin((F.col("x") + F.lit(1.9)) / F.lit(3.8)).alias("a"),
        )
        .collect()
    )
    prev_a = -1.0
    for r in rows:
        assert abs(r["s"] - math.sin(r["x"])) < 5e-15
        assert abs(r["c"] - math.cos(r["x"])) < 5e-15
        y = (r["x"] + 1.9) / 3.8
        if y <= 0.4:
            assert abs(r["a"] - math.asin(y)) < 1e-9
        assert r["a"] > prev_a, "det_asin must be strictly increasing"
        prev_a = r["a"]


def test_det_ln_ratio_const_bit_identical_to_column_tree(spark, pairs):
    """r14: the driver-side constant fold (det_ln_ratio_const, used by
    the linkage scorer for literal m/u ratios) must be BIT-identical to
    what Spark computes for the det_ln_ratio Column tree — CPython's
    float ops are the same correctly-rounded IEEE doubles, but only if
    the operation sequence mirrors the tree exactly."""
    from ent_fins_lakehouse_spark.functions.detmath import det_ln_ratio_const

    df = spark.createDataFrame(pairs, "a long, b long")
    srows = {
        (r["a"], r["b"]): r["v"]
        for r in df.select(
            "a", "b", det_ln_ratio(F.col("a"), F.col("b")).alias("v")
        ).collect()
    }
    for (a, b), v in srows.items():
        assert _bits(det_ln_ratio_const(a, b)) == _bits(v), (a, b, v)
