"""Physical-plan regression guards.

Correctness tests prove the numbers; these prove the PLAN — that the
properties which keep the engine fast at 100 TB (scan pushdown, column
pruning, broadcast dimension joins, partial aggregation) survive
refactors. A plan that silently loses `PushedFilters` or turns a
broadcast join into a shuffle join passes every value check and then
falls over at scale; this is the canary."""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_SMOKE


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def qmap(spark):
    from ent_fins_lakehouse_spark.plans.registry import queries_map

    return queries_map()


def test_q01_pushdown_and_pruning(spark, qmap):
    plan = plan_of(qmap["q01_pricing_summary"](spark, SF_SMOKE))
    # shipdate predicate reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 used columns — wide columns never read
    assert "l_partkey" not in plan and "l_suppkey" not in plan
    # partial+final split around the exchange (map-side combine)
    assert "partial_sum" in plan


def test_q03_dims_are_broadcast(spark, qmap):
    plan = plan_of(qmap["q03_regional_revenue"](spark, SF_SMOKE))
    # region filter pushed; nation/region/supplier sides broadcast
    assert "EqualTo(r_name,ASIA)" in plan
    assert "BroadcastHashJoin" in plan
    # the only sort-merge-eligible joins are the big fact equi-joins
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q12_explicit_broadcast_hint_respected(spark, qmap):
    plan = plan_of(qmap["q12_broadcast_dim_join"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q09_semi_join_stays_semi(spark, qmap):
    plan = plan_of(qmap["q09_semi_join"](spark, SF_SMOKE))
    assert "LeftSemi" in plan


def test_q23_events_projection_pruned(spark, qmap):
    plan = plan_of(qmap["q23_events_hourly"](spark, SF_SMOKE))
    # events has 6 columns; the hourly rollup needs ts/event_type/value
    assert "user_id" not in plan and "props" not in plan


def test_q50_dedup_is_hash_agg_not_sort(spark, qmap):
    plan = plan_of(qmap["q50_exact_dedup"](spark, SF_SMOKE))
    assert "HashAggregate" in plan


def test_flagship_entry_plan(spark):
    import __spark_entry__ as e

    plan = plan_of(e.entry(spark))
    assert "PushedFilters" in plan
    assert "HashAggregate" in plan


def test_q82_decorrelated_avg_is_broadcast(spark, qmap):
    """The per-part average join-back must broadcast (it is ~|part|
    rows at any SF), not shuffle 600M lineitem rows."""
    plan = plan_of(qmap["q82_small_qty_revenue"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_q86_single_lineitem_scan(spark, qmap):
    """The HAVING aggregate doubles as the per-order sum, so lineitem
    is scanned exactly once, the survivor set broadcasts, and the agg
    keeps its partial/final split."""
    plan = plan_of(qmap["q86_large_volume_customers"](spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_q89_salted_join_matches_plain(spark):
    """salted_join row-level equivalence to the plain join (the q89
    oracle asserts the aggregate; this asserts the raw pairs)."""
    from ent_fins_lakehouse_spark.operators.skew import salted_join
    from ent_fins_lakehouse_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_linenumber")
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .select("l_orderkey", "o_orderpriority")
    )
    plain = li.join(orders, ["l_orderkey"])
    salted = salted_join(li, orders, ["l_orderkey"], num_salts=4)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()
