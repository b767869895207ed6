"""Approximate aggregates — the 100 TB path where exact sorts/distincts
are the bottleneck. Error-bound assertions against exact answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events(spark):
    from ent_fins_lakehouse_spark.sources.readers import load_table

    return load_table(spark, SF_ORACLE, "events").cache()


def test_approx_count_distinct_bound(events):
    exact = events.select(F.countDistinct("user_id")).collect()[0][0]
    approx = events.select(F.approx_count_distinct("user_id", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.06  # 3x the target rsd


def test_percentile_approx_bound(events):
    rows = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.percentile_approx("value", 0.5, accuracy=10000).alias("approx"),
    ).collect()[0]
    spread = events.agg(F.max("value") - F.min("value")).collect()[0][0]
    assert abs(rows["approx"] - rows["exact"]) <= 0.01 * spread


def test_approx_distinct_grouped_monotone(events):
    """Grouped HLL counts stay within bound per group."""
    got = {
        r["event_type"]: (r["exact"], r["approx"])
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    }
    assert got
    for exact, approx in got.values():
        assert abs(approx - exact) / max(exact, 1) <= 0.06


def test_q90_sketch_error_bound(spark):
    """q90's hash-checkable form: every group's HLL++ estimate must
    fall within the 5% bound claim the oracle asserts as literal TRUE
    (the raw 3×rsd bound is covered above on the same data)."""
    from ent_fins_lakehouse_spark.plans.registry import queries_map
    from tests.conftest import SF_ORACLE

    rows = queries_map()["q90_approx_distinct"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["within_bound"] is True, (r["event_type"], r["exact_users"])
