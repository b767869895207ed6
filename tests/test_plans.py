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


@contextlib.contextmanager
def _sql_conf(spark, overrides: dict):
    old = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_vocab_broadcast_is_census_gated(spark):
    """q66/q139's scale contract: the vocabulary-sized dimension
    (one row per distinct corpus token — 10⁸–10⁹ on a real web corpus)
    is broadcast ONLY while the census proves it small. Above the cap
    the hint must vanish so the join degrades to a shuffle join
    instead of OOMing on a forced broadcast."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.operators.blocking import broadcast_if_small
    from ent_fins_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    dim = toks.groupBy("term").agg(F.count("*").alias("tf"))
    # disable every AUTOMATIC broadcast path so a BroadcastHashJoin can
    # only come from the explicit hint under test
    with _sql_conf(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        hinted = toks.join(broadcast_if_small(dim, toks, "term"), "term")
        assert "BroadcastHashJoin" in plan_of(hinted)
        over_cap = toks.join(broadcast_if_small(dim, toks, "term", max_keys=0), "term")
        p = plan_of(over_cap)
        assert "BroadcastExchange" not in p, "forced broadcast survived the census gate"
        assert "SortMergeJoin" in p


def test_q139_has_no_forced_vocab_broadcast(spark, qmap):
    """The q139 term-count join must carry no forced broadcast hint:
    with automatic broadcasting disabled it falls back to a shuffle
    join (only the 1-row constants table is explicitly broadcast —
    broadcasting one row is always safe)."""
    with _sql_conf(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        df = qmap["q139_unigram_lm_quality"](spark, SF_SMOKE)
        assert "SortMergeJoin" in plan_of(df), "tc join should shuffle when broadcast is off"
        # exactly the 1-row consts broadcast remains ("simple" mode:
        # one line per node, unlike "formatted" which repeats nodes)
        assert plan_of(df, "simple").count("BroadcastExchange") <= 1


def test_census_is_memoized_per_plan(spark):
    """Round-6 hygiene (r5 verdict #9): in a hot serving loop over one
    immutable table version, only the first broadcast_if_small call
    pays the census job — later calls reuse the memoized distinct-count
    (keyed by the census source's semantic plan hash)."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.operators import blocking
    from ent_fins_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    dim = toks.groupBy("term").agg(F.count("*").alias("tf"))

    blocking._CENSUS_CACHE.clear()
    blocking.broadcast_if_small(dim, toks, "term")
    key = (toks.semanticHash(), "term")
    assert key in blocking._CENSUS_CACHE, "census result not memoized"
    true_n = blocking._CENSUS_CACHE[key]

    # poison the cache: if the second call consults it (no fresh census
    # job), the over-cap fake count must flip the decision to no-hint
    blocking._CENSUS_CACHE[key] = blocking.DEFAULT_MAX_BROADCAST_KEYS + 1
    undated = blocking.broadcast_if_small(dim, toks, "term")
    with _sql_conf(
        spark,
        {"spark.sql.autoBroadcastJoinThreshold": "-1", "spark.sql.adaptive.enabled": "false"},
    ):
        p = plan_of(toks.join(undated, "term"))
        assert "BroadcastExchange" not in p, "cached census was not consulted"
    # …and the cached value, not the decision, is what's stored: a
    # stricter max_keys on the same cache entry flips the other way
    blocking._CENSUS_CACHE[key] = true_n
    hinted = blocking.broadcast_if_small(dim, toks, "term")
    with _sql_conf(
        spark,
        {"spark.sql.autoBroadcastJoinThreshold": "-1", "spark.sql.adaptive.enabled": "false"},
    ):
        assert "BroadcastHashJoin" in plan_of(toks.join(hinted, "term"))
    blocking._CENSUS_CACHE.clear()


def test_q66_persist_is_bounded_across_invocations(spark, qmap):
    """Round-6 hygiene (r5 verdict #6): q66 persists its tf matrix for
    three-way reuse, but repeated invocations must swap-and-unpersist —
    at most ONE cached copy alive, and no driver-side count() actions
    beyond the memoized census (N rides a 1-row broadcast cross join)."""
    q66 = qmap["q66_tfidf_top_terms"]
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    for _ in range(3):
        q66(spark, SF_SMOKE).count()
    assert jsc.getPersistentRDDs().size() <= baseline + 1, (
        "q66 accumulated cached partitions across invocations"
    )
