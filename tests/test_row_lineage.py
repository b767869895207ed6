"""Iceberg v3 row lineage (sources/iceberg.py: enable_row_lineage /
read_with_lineage / first_row_id assignment / DML preservation).

Spec contract under test ('Row Lineage'):
- ids are inherited as first_row_id + file position; next-row-id is
  monotonic and advances atomically with the commit;
- files written BEFORE the upgrade read NULL lineage;
- soft deletes (DV) never move surviving ids;
- compaction preserves ids exactly (materialized columns);
- UPDATE / MERGE keep a row's _row_id across versions and stamp the
  new commit's sequence; CoW survivors keep both columns;
- inserts get fresh unique ids; the plain read() surface is unchanged.
"""

from __future__ import annotations

import shutil

import pytest

from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable


def _mk(spark, tmp_path, name, n=20, enable=True):
    path = str(tmp_path / name)
    shutil.rmtree(path, ignore_errors=True)
    t = IcebergTable(spark, path)
    base = spark.range(0, n).selectExpr("id AS k", "CAST(id*2 AS LONG) AS v")
    if enable:
        t.append(base.limit(0).coalesce(1))
        t.enable_row_lineage()
    t.append(base.coalesce(1).sortWithinPartitions("k"))
    return t


def _lin(t):
    return {
        r.k: (r._row_id, r._last_updated_sequence_number)
        for r in t.read_with_lineage().collect()
    }


def test_refuses_without_enable(spark, tmp_path):
    t = _mk(spark, tmp_path, "noenable", enable=False)
    with pytest.raises(ValueError, match="row lineage is not enabled"):
        t.read_with_lineage()


def test_pre_upgrade_files_read_null_ids(spark, tmp_path):
    path = str(tmp_path / "preup")
    t = IcebergTable(spark, path)
    t.append(spark.range(0, 5).selectExpr("id AS k", "CAST(0 AS LONG) AS v"))
    t.enable_row_lineage()
    t.append(
        spark.range(5, 8)
        .selectExpr("id AS k", "CAST(0 AS LONG) AS v")
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    got = _lin(t)
    assert all(got[k][0] is None for k in range(5)), "pre-upgrade ids must be NULL"
    assert sorted(got[k][0] for k in range(5, 8)) == [0, 1, 2]
    assert t.metadata()["next-row-id"] == 3


def test_append_slices_counter_and_snapshot_records_first_row_id(spark, tmp_path):
    t = _mk(spark, tmp_path, "slices", n=10)
    t.append(
        spark.range(100, 107)
        .selectExpr("id AS k", "CAST(0 AS LONG) AS v")
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    got = _lin(t)
    assert sorted(v[0] for v in got.values()) == list(range(17))
    assert t.metadata()["next-row-id"] == 17
    firsts = [
        s.get("first-row-id")
        for s in t.metadata()["snapshots"]
        if "first-row-id" in s
    ]
    assert firsts == [0, 10]


def test_dv_delete_keeps_surviving_ids(spark, tmp_path):
    t = _mk(spark, tmp_path, "dvdel")
    pre = _lin(t)
    t.delete("k % 4 = 2", mode="dv")
    post = _lin(t)
    assert set(post) == {k for k in pre if k % 4 != 2}
    assert all(post[k] == pre[k] for k in post)


def test_compact_preserves_ids_exactly(spark, tmp_path):
    t = _mk(spark, tmp_path, "cmp")
    t.delete("k % 5 = 0", mode="dv")
    pre = _lin(t)
    t.compact(target_files=2)
    assert _lin(t) == pre
    # counter over-allocates on the preserving rewrite (spec-legal:
    # next-row-id only grows) and the NEXT append stays collision-free
    t.append(
        spark.range(50, 53)
        .selectExpr("id AS k", "CAST(0 AS LONG) AS v")
        .coalesce(1)
        .sortWithinPartitions("k")
    )
    post = _lin(t)
    ids = [v[0] for v in post.values()]
    assert len(ids) == len(set(ids))
    assert all(post[k] == pre[k] for k in pre)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_preserves_row_id_and_bumps_sequence(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, f"upd_{mode}")
    pre = _lin(t)
    t.update({"v": "v + 1000"}, "k % 4 = 1", mode=mode)
    post = _lin(t)
    # append (after the creating empty commit) is seq 2; update is seq 3
    assert all(post[k][0] == pre[k][0] for k in pre)
    assert all((post[k][1] == 3) == (k % 4 == 1) for k in pre)
    upd = {r.k: r.v for r in t.read().collect()}
    assert all((upd[k] == k * 2 + 1000) == (k % 4 == 1) for k in upd)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_keeps_updated_ids_fresh_insert_ids(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, f"mrg_{mode}")
    pre = _lin(t)
    src = (
        spark.range(0, 5)
        .selectExpr("id AS k", "CAST(999 AS LONG) AS v")
        .unionAll(spark.range(100, 105).selectExpr("id AS k", "CAST(1 AS LONG) AS v"))
    )
    t.merge(src, on=["k"], mode=mode)
    post = _lin(t)
    assert all(post[k][0] == pre[k][0] and post[k][1] == 3 for k in range(5))
    assert all(post[k] == pre[k] for k in range(5, 20))
    ins_ids = [post[k][0] for k in range(100, 105)]
    assert min(ins_ids) >= 20
    assert len(set(v[0] for v in post.values())) == len(post)


def test_delete_cow_survivors_preserved(spark, tmp_path):
    t = _mk(spark, tmp_path, "delcow")
    pre = _lin(t)
    t.delete("k % 3 = 0", mode="cow")
    post = _lin(t)
    assert set(post) == {k for k in pre if k % 3 != 0}
    assert all(post[k] == pre[k] for k in post)


def test_plain_read_surface_unchanged(spark, tmp_path):
    t = _mk(spark, tmp_path, "plain")
    t.compact(target_files=1)  # files now carry materialized lineage cols
    df = t.read()
    assert df.columns == ["k", "v"]
    assert df.count() == 20


def test_delta_row_tracking_translates_to_iceberg_lineage(spark, tmp_path):
    """UniForm + row identity: a row-tracked Delta table's baseRowId
    becomes the Iceberg twin's first_row_id (both formats define the
    row id as base + file position), the twin's next-row-id continues
    from the source high water mark, and convert → append+sync →
    DV-delete+sync all serve IDENTICAL ids from either format."""
    from ent_fins_lakehouse_spark.sources.iceberg import (
        convert_delta_to_iceberg,
        sync_delta_to_iceberg,
    )
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    dl = DeltaLogTable(spark, str(tmp_path / "dl"))
    dl.write(
        spark.range(0, 25).selectExpr("id AS k", "id*2 AS v").coalesce(2),
        mode="append",
    )
    dl.enable_row_tracking()
    dl.write(
        spark.range(25, 40).selectExpr("id AS k", "id*2 AS v").coalesce(1),
        mode="append",
    )
    ice = convert_delta_to_iceberg(spark, dl, str(tmp_path / "ice"))
    assert int(ice.metadata()["format-version"]) == 3
    assert ice.metadata()["next-row-id"] == 40

    def ids(t, reader):
        return {r.k: r._row_id for r in reader(t).collect()}

    assert ids(dl, DeltaLogTable.read_with_row_ids) == ids(
        ice, lambda t: t.read_with_lineage()
    )
    dl.write(
        spark.range(40, 50).selectExpr("id AS k", "id*2 AS v").coalesce(1),
        mode="append",
    )
    sync_delta_to_iceberg(spark, dl, ice)
    assert ids(dl, DeltaLogTable.read_with_row_ids) == ids(
        ice, lambda t: t.read_with_lineage()
    )
    assert ice.metadata()["next-row-id"] == 50
    dl.delete("k % 6 = 1")
    sync_delta_to_iceberg(spark, dl, ice)
    got = ids(ice, lambda t: t.read_with_lineage())
    assert got == ids(dl, DeltaLogTable.read_with_row_ids)
    assert len(got) == 41


def test_entries_metadata_table(spark, tmp_path):
    """<table>.entries: per-entry status/sequence/content/first_row_id
    visible, sequence inherited from the manifest-list row."""
    t = _mk(spark, tmp_path, "entries", n=10)
    t.delete("k % 5 = 0", mode="dv")
    e = t.entries_df()
    # two data entries: the (empty) creation file + the real append
    data = e.filter("content = 0 AND record_count > 0").collect()
    dvs = e.filter("content = 1").collect()
    assert e.filter("content = 0").count() == 2
    assert len(data) == 1 and len(dvs) == 1
    assert data[0].record_count == 10 and data[0].first_row_id == 0
    assert data[0].sequence_number < dvs[0].sequence_number
    assert dvs[0].first_row_id is None


def test_iceberg_lineage_translates_to_delta_row_tracking(spark, tmp_path):
    """The REVERSE identity arrow (twin of
    test_delta_row_tracking_translates_to_iceberg_lineage): a
    lineage-on Iceberg table's first_row_id becomes the converted Delta
    twin's baseRowId, the twin's rowIdHighWaterMark continues from the
    source next-row-id, convert -> append+sync serves bit-identical id
    maps from either format, and a native Delta append AFTER the sync
    mints fresh non-colliding ids."""
    from ent_fins_lakehouse_spark.sources.iceberg import (
        convert_iceberg_to_delta,
        sync_iceberg_to_delta,
    )
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    ice = _mk(spark, tmp_path, "rev_src", n=25)
    dest = str(tmp_path / "rev_dl")
    dl = convert_iceberg_to_delta(spark, ice, dest)

    def ice_ids(t):
        return {r.k: r._row_id for r in t.read_with_lineage().collect()}

    def dl_ids(path):
        return {
            r.k: r._row_id
            for r in DeltaLogTable(spark, path).read_with_row_ids().collect()
        }

    assert dl_ids(dest) == ice_ids(ice)
    assert ice.metadata()["next-row-id"] == 25
    # the twin's watermark continues from the source counter
    fresh = DeltaLogTable(spark, dest)
    fresh._snapshot()
    assert fresh._rt_enabled and fresh._rt_hwm == 24

    # incremental sync carries the new file's ids verbatim
    ice.append(
        spark.range(25, 40).selectExpr("id AS k", "CAST(id*2 AS LONG) AS v").coalesce(1)
    )
    assert sync_iceberg_to_delta(spark, ice, dl) is not None
    assert dl_ids(dest) == ice_ids(ice)

    # a native Delta append after the sync mints fresh unique ids
    dl2 = DeltaLogTable(spark, dest)
    dl2.write(
        spark.range(40, 45).selectExpr("id AS k", "CAST(id*2 AS LONG) AS v").coalesce(1),
        mode="append",
    )
    got = dl_ids(dest)
    assert sorted(got) == list(range(45))
    assert len(set(got.values())) == 45, "synced and native ids collided"


def test_pre_lineage_nonempty_files_refuse_conversion(spark, tmp_path):
    """Delta row tracking has no NULL-id representation (every add must
    carry baseRowId), so converting a lineage-on table that still holds
    a non-empty PRE-lineage file must refuse loudly and point at
    compact(); after compacting (ids materialize) the conversion
    serves the same ids as the source."""
    from ent_fins_lakehouse_spark.sources.iceberg import convert_iceberg_to_delta
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    path = str(tmp_path / "pre_src")
    t = IcebergTable(spark, path)
    t.append(
        spark.range(0, 10).selectExpr("id AS k", "CAST(id*2 AS LONG) AS v").coalesce(1)
    )
    t.enable_row_lineage()
    t.append(
        spark.range(10, 20).selectExpr("id AS k", "CAST(id*2 AS LONG) AS v").coalesce(1)
    )
    dest = str(tmp_path / "pre_dl")
    with pytest.raises(NotImplementedError, match="predates row lineage"):
        convert_iceberg_to_delta(spark, t, dest)
    t.compact(target_files=1)
    convert_iceberg_to_delta(spark, t, dest)
    ice_ids = {r.k: r._row_id for r in t.read_with_lineage().collect()}
    dl_ids = {
        r.k: r._row_id
        for r in DeltaLogTable(spark, dest).read_with_row_ids().collect()
    }
    assert dl_ids == ice_ids and None not in dl_ids.values()
