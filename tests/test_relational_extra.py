"""Tests for the q96-q104 function-suite batch: statistical aggregate
definitions, higher-order array semantics, gap-fill completeness, and
vacuum safety."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def qmap(spark):
    from ent_fins_lakehouse_spark.plans.registry import queries_map

    return queries_map()


def test_builtin_skew_kurtosis_match_pinned_moments(spark, qmap):
    """Spark's built-in skewness/kurtosis use the population definition;
    the pinned decimal-moment formulas in q98 must agree to float noise."""
    pinned = {
        r["l_returnflag"]: (r["skew_pop"], r["kurt_pop"])
        for r in qmap["q98_moment_skew_kurtosis"](spark, SF_SMOKE).collect()
    }
    builtin = {
        r["l_returnflag"]: (r["sk"], r["ku"])
        for r in (
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(F.skewness("l_quantity").alias("sk"), F.kurtosis("l_quantity").alias("ku"))
        ).collect()
    }
    assert set(pinned) == set(builtin)
    for flag, (sk, ku) in pinned.items():
        bsk, bku = builtin[flag]
        assert math.isclose(sk, bsk, abs_tol=1e-3), (flag, sk, bsk)
        assert math.isclose(ku, bku, abs_tol=1e-3), (flag, ku, bku)


def test_higher_order_norms_match_numpy(spark, qmap):
    """q102's codegen lambda math equals numpy's vector norms."""
    import numpy as np

    rows = qmap["q102_higher_order_arrays"](spark, SF_SMOKE).collect()
    raw = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter(F.col("vec_id") % 37 == 0)
        .collect()
    }
    assert rows and len(rows) == len(raw)
    for r in rows:
        v = raw[r["vec_id"]]
        assert r["pos_count"] == int((v > 0).sum())
        assert math.isclose(r["l1_norm"], float(np.abs(v).sum()), abs_tol=2e-4)
        assert math.isclose(r["l2_norm"], float(np.sqrt((v * v).sum())), abs_tol=2e-4)


def test_gap_fill_is_dense_and_zero_filled(spark, qmap):
    """The day spine has exactly one row per calendar day; gaps carry
    an explicit zero, not an absent row."""
    rows = qmap["q96_date_spine_gap_fill"](spark, SF_SMOKE).collect()
    assert len(rows) == 181  # 1995-01-01 .. 1995-06-30
    days = [r["day"] for r in rows]
    assert len(set(days)) == 181
    for r in rows:
        assert (r["n_orders"] == 0) == (r["is_gap"] == 1)


def test_vacuum_preserves_snapshot_kills_history(spark, tmp_path):
    """After vacuum: latest read unchanged, time travel to superseded
    versions raises (files physically gone)."""
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    t = LakeTable(spark, str(tmp_path / "t"))
    t.write(df, mode="overwrite")
    t.delete("o_orderstatus = 'P'")
    before = t.read().count()
    assert t.vacuum() > 0
    assert t.read().count() == before
    with pytest.raises(Exception):
        t.read(version_as_of=0).count()


def test_sole_late_supplier_blames_exactly_one(spark, qmap):
    """Every blamed order in q101 has exactly one late supplier among
    several — re-derived independently via SQL over temp views."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    flagged = (
        li.join(orders.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAY")).alias("late"),
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    eligible = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)).count()
    total = sum(
        r["numwait"]
        for r in qmap["q101_sole_late_supplier"](spark, SF_SMOKE).collect()
    )
    # top-10 cut means total <= eligible; both sides nonneg and consistent
    assert 0 <= total <= eligible
