"""Data-skipping tests: stats-based dir pruning must be exactly as
selective as the stored ranges allow and NEVER change results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def table(spark, tmp_path):
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"))
    # 4 appends with disjoint id ranges -> 4 dirs with tight stats
    t.write(spark.range(0, 100).withColumn("v", F.col("id") * 2), mode="overwrite")
    for lo in (100, 200, 300):
        t.insert_into(spark.range(lo, lo + 100).withColumn("v", F.col("id") * 2))
    return t


def test_point_predicate_prunes_to_one_dir(table):
    info = table.scan_info("id = 250")
    assert info == {"n_active": 4, "n_read": 1, "n_pruned": 3}
    got = table.read(where="id = 250").collect()
    assert [(r["id"], r["v"]) for r in got] == [(250, 500)]


def test_range_and_between_predicates(table):
    assert table.scan_info("id >= 300")["n_read"] == 1
    assert table.scan_info("id < 100")["n_read"] == 1
    assert table.scan_info("id BETWEEN 150 AND 250")["n_read"] == 2
    assert table.read(where="id BETWEEN 150 AND 250").count() == 101


def test_unparseable_predicate_reads_everything(table):
    info = table.scan_info("id % 7 = 0")
    assert info["n_read"] == 4 and info["n_pruned"] == 0
    assert table.read(where="id % 7 = 0").count() == 58  # correct anyway


def test_pruned_vs_unpruned_results_identical(table):
    pruned = sorted(r["id"] for r in table.read(where="id > 320").collect())
    unpruned = sorted(r["id"] for r in table.read().filter("id > 320").collect())
    assert pruned == unpruned


def test_delete_uses_stats_preprune(table):
    # deleting a range confined to one dir must rewrite only that dir
    m = table.delete("id >= 300 AND id <= 310")
    assert table.read().count() == 400 - 11
    hist = {r["operation"] for r in table.history().collect()}
    assert "delete" in hist


def test_zorder_makes_point_queries_selective(spark, tmp_path):
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    t = LakeTable(spark, str(tmp_path / "z"))
    # interleaved key -> every dir spans the whole range: no pruning
    t.write(
        spark.range(0, 1000).withColumn("k", F.col("id") % 100), mode="overwrite"
    )
    for _ in range(3):
        t.insert_into(spark.range(0, 1000).withColumn("k", F.col("id") % 100))
    before = t.scan_info("k = 7")
    assert before["n_pruned"] == 0
    t.optimize(zorder_by=["k"], target_files=8)
    after = t.scan_info("k = 7")
    assert after["n_active"] >= 4
    assert after["n_read"] <= 2, f"zorder should prune most dirs: {after}"
    # and the answer is unchanged
    assert t.read(where="k = 7").count() == 4000 // 100


def test_string_stats_prune(spark, tmp_path):
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    t = LakeTable(spark, str(tmp_path / "s"))
    t.write(spark.createDataFrame([("apple",), ("banana",)], "w STRING"), mode="overwrite")
    t.insert_into(spark.createDataFrame([("xray",), ("zulu",)], "w STRING"))
    assert t.scan_info("w = 'zebra'")["n_read"] == 1
    assert t.read(where="w = 'zulu'").count() == 1


def test_nan_bounds_never_prune(spark, tmp_path):
    """ADVICE r1: Spark orders NaN above all values ('x > 5' matches
    NaN rows) but Python nan comparisons are all False — a dir whose
    max is NaN must be treated as having no stats, not pruned."""
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable
    from ent_fins_lakehouse_spark.sources.skipping import range_may_match

    assert range_may_match([("x", ">", 5)], {"x": [1.0, float("nan")]})
    assert range_may_match([("x", "=", 7)], {"x": [float("nan"), float("nan")]})

    t = LakeTable(spark, str(tmp_path / "nan_t"))
    t.write(spark.createDataFrame([(1.0,), (2.0,), (float("nan"),)], "x DOUBLE"))
    t.write(spark.createDataFrame([(3.0,), (4.0,)], "x DOUBLE"), mode="append")
    pruned = t.read(where="x > 5")
    full = t.read().filter("x > 5")
    assert sorted(map(str, (r["x"] for r in pruned.collect()))) == sorted(
        map(str, (r["x"] for r in full.collect()))
    )
    assert pruned.count() == 1  # the NaN row
