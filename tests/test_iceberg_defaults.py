"""Iceberg v3 default values (sources/iceberg.py: add_column(default=),
_apply_initial_defaults, append write-default fill).

Spec contract ('Default values'): initial-default is what pre-evolution
files read (metadata-only backfill); write-default fills appends that
omit the column; explicit values — including explicit NULL — stored by
post-evolution writers always win; non-primitive defaults refuse.
"""

from __future__ import annotations

import pytest

from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "dflt"))
    t.append(
        spark.range(0, 10).selectExpr("id AS k", "CAST(id * 2 AS LONG) AS v").coalesce(1)
    )
    t.add_column("region", "string", default="unassigned")
    return t


def test_initial_default_fills_pre_evolution_files(spark, tbl):
    got = {r.k: r.region for r in tbl.read().collect()}
    assert all(got[k] == "unassigned" for k in range(10))
    assert int(tbl.metadata()["format-version"]) == 3


def test_explicit_values_and_explicit_nulls_win(spark, tbl):
    tbl.append(
        spark.range(10, 14)
        .selectExpr(
            "id AS k",
            "CAST(0 AS LONG) AS v",
            "CASE WHEN id % 2 = 0 THEN 'west' END AS region",
        )
        .coalesce(1)
    )
    got = {r.k: r.region for r in tbl.read().collect()}
    assert got[10] == got[12] == "west"
    assert got[11] is None and got[13] is None, "explicit NULL must stay NULL"


def test_write_default_fills_omitted_column(spark, tbl):
    tbl.append(
        spark.range(20, 23).selectExpr("id AS k", "CAST(0 AS LONG) AS v").coalesce(1)
    )
    got = {r.k: r.region for r in tbl.read().collect()}
    assert [got[k] for k in (20, 21, 22)] == ["unassigned"] * 3


def test_dml_predicates_resolve_defaults(spark, tbl):
    res = tbl.delete("region = 'unassigned' AND k < 4", mode="cow")
    assert res["rows_deleted"] == 4
    assert tbl.read().count() == 6
    assert tbl.read(where="region = 'unassigned'").count() == 6


def test_update_sees_and_overwrites_default(spark, tbl):
    tbl.update({"region": "'migrated'"}, "region = 'unassigned' AND k >= 8", mode="cow")
    got = {r.k: r.region for r in tbl.read().collect()}
    assert got[8] == got[9] == "migrated"
    assert all(got[k] == "unassigned" for k in range(8))


def test_non_primitive_default_refuses(spark, tbl):
    with pytest.raises(NotImplementedError, match="primitive types only"):
        tbl.add_column("ts2", "timestamp", default="2020-01-01")


def test_missing_column_without_default_still_refuses(spark, tbl):
    with pytest.raises(ValueError, match="does not match"):
        tbl.append(spark.range(0, 2).selectExpr("id AS k").coalesce(1))


def test_sql_facade_add_column_default_both_formats(spark, tmp_path):
    """ALTER TABLE ... ADD COLUMN ... DEFAULT through the SQL facade:
    Iceberg gets initial+write defaults (pre-evolution rows READ the
    default); Delta gets allowColumnDefaults (future writes only —
    existing rows stay NULL, Delta's own contract)."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE db")
    lh.sql("USE db")

    ice = IcebergTable(spark, str(tmp_path / "wh" / "db" / "ice"))
    ice.append(spark.range(5).select(F.col("id").cast("long")))
    lh.sql(f"CREATE TABLE ice USING ICEBERG LOCATION '{ice.path}'")
    lh.sql("ALTER TABLE ice ADD COLUMN tier STRING DEFAULT 'standard'")
    assert ice.read().filter("tier = 'standard'").count() == 5

    dl_path = str(tmp_path / "wh" / "db" / "dl")
    dl = DeltaLogTable(spark, dl_path)
    dl.write(spark.range(5).select(F.col("id")), mode="append")
    lh.sql(f"CREATE TABLE dl USING DELTA LOCATION '{dl_path}'")
    lh.sql("ALTER TABLE dl ADD COLUMN tier STRING DEFAULT 'basic'")
    # Delta: existing rows read NULL; a write omitting the column fills
    assert dl.read().filter("tier IS NULL").count() == 5
    dl.write(spark.range(5, 8).select(F.col("id")), mode="append")
    assert dl.read().filter("tier = 'basic'").count() == 3
