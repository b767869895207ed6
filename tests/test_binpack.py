"""Selective bin-pack compaction (DeltaLogTable.optimize
min_file_size_bytes / IcebergTable.rewrite_small_files).

Contract: only files under the size gate are rewritten; right-sized
files carry forward byte-for-byte (including their DVs); content is
identical before/after; row lineage survives on the Iceberg side;
fewer than two eligible files is a no-op (no commit).
"""

from __future__ import annotations

import os

import pytest

from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable


def _build_delta(spark, path):
    t = DeltaLogTable(spark, path)
    t.write(
        spark.range(0, 100000).selectExpr("id AS k", "id*2 AS v").coalesce(1),
        mode="append",
    )
    for i in range(4):
        t.write(
            spark.range(100000 + i * 50, 100000 + i * 50 + 50)
            .selectExpr("id AS k", "id*2 AS v")
            .coalesce(1),
            mode="append",
        )
    return t


def test_delta_binpack_rewrites_only_small_files(spark, tmp_path):
    t = _build_delta(spark, str(tmp_path / "d1"))
    t.delete("k >= 100050 AND k < 100075")  # DV on a small file
    adds0, *_ = t._snapshot()
    big = max(adds0, key=lambda p: int(adds0[p].get("size") or 0))
    pre = {r.k: r.v for r in t.read().collect()}
    v0 = t.latest_version()
    res = t.optimize(min_file_size_bytes=int(adds0[big]["size"]))
    assert res["files_selected"] == 4 and res["dvs_materialized"] == 1
    adds1, *_ = t._snapshot()
    assert big in adds1 and adds1[big] == adds0[big], "right-sized add changed"
    assert {r.k: r.v for r in t.read().collect()} == pre
    assert not any(i["deletionVector"] for i in adds1.values())
    # untouched-DV case: DV on the BIG file survives binpack verbatim
    t.delete("k < 10")
    adds2, *_ = t._snapshot()
    assert adds2[big]["deletionVector"] is not None
    t.write(
        spark.range(200000, 200050).selectExpr("id AS k", "id*2 AS v").coalesce(1),
        mode="append",
    )
    t.optimize(min_file_size_bytes=int(adds0[big]["size"]))
    adds3, *_ = t._snapshot()
    assert adds3[big]["deletionVector"] == adds2[big]["deletionVector"]
    assert t.read().count() == len(pre) - 10 + 50
    assert t.latest_version() > v0


def test_delta_binpack_noop_and_refusals(spark, tmp_path):
    t = DeltaLogTable(spark, str(tmp_path / "d2"))
    t.write(spark.range(0, 100).selectExpr("id AS k").coalesce(1), mode="append")
    v0 = t.latest_version()
    res = t.optimize(min_file_size_bytes=10**9)
    assert res["files_selected"] == 1 and t.latest_version() == v0, "no-op must not commit"
    with pytest.raises(ValueError, match="binpack gate"):
        t.optimize(min_file_size_bytes=10**9, zorder_by=["k"])


def _build_iceberg(spark, path, lineage=False):
    t = IcebergTable(spark, path)
    base = spark.range(0, 100000).selectExpr("id AS k", "id*2 AS v")
    if lineage:
        t.append(base.limit(0).coalesce(1))
        t.enable_row_lineage()
    t.append(base.coalesce(1))
    for i in range(4):
        t.append(
            spark.range(100000 + i * 50, 100000 + i * 50 + 50)
            .selectExpr("id AS k", "id*2 AS v")
            .coalesce(1)
        )
    return t


def test_iceberg_binpack_keeps_big_file_and_content(spark, tmp_path):
    t = _build_iceberg(spark, str(tmp_path / "i1"))
    t.delete("k >= 100050 AND k < 100075", mode="dv")
    big = max(t.data_files(), key=os.path.getsize)
    pre = {r.k: r.v for r in t.read().collect()}
    res = t.rewrite_small_files(small_file_threshold_bytes=os.path.getsize(big))
    assert res["files_selected"] == 4
    assert big in t.data_files()
    assert {r.k: r.v for r in t.read().collect()} == pre
    # dangling DV manifest reclaimed by rewrite_manifests
    t.rewrite_manifests()
    assert t._dv_entries() == []
    assert {r.k: r.v for r in t.read().collect()} == pre
    # time travel still serves the pre-binpack snapshot
    prior = t.snapshots()[-2]["snapshot-id"]
    assert t.read(snapshot_id=prior).count() == len(pre)


def test_iceberg_binpack_preserves_row_lineage(spark, tmp_path):
    t = _build_iceberg(spark, str(tmp_path / "i2"), lineage=True)
    pre = {
        r.k: (r._row_id, r._last_updated_sequence_number)
        for r in t.read_with_lineage().collect()
    }
    big = max(t.data_files(), key=os.path.getsize)
    t.rewrite_small_files(small_file_threshold_bytes=os.path.getsize(big))
    post = {
        r.k: (r._row_id, r._last_updated_sequence_number)
        for r in t.read_with_lineage().collect()
    }
    assert post == pre


def test_iceberg_binpack_noop(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "i3"))
    t.append(spark.range(0, 100).selectExpr("id AS k").coalesce(1))
    n_snaps = len(t.snapshots())
    res = t.rewrite_small_files(small_file_threshold_bytes=10**9)
    assert res["files_selected"] == 1 and res["bytes_rewritten"] == 0
    assert len(t.snapshots()) == n_snaps, "no-op must not commit"


def test_delta_auto_compact_hook(spark, tmp_path):
    """delta.autoOptimize.autoCompact: the 8th small append triggers a
    follow-up binpack commit; right-sized files and content survive."""
    t = DeltaLogTable(spark, str(tmp_path / "ac"))
    t.write(
        spark.range(0, 50).selectExpr("id AS k").coalesce(1), mode="append"
    )
    t.set_property("delta.autoOptimize.autoCompact", "true")
    t.set_property("delta.autoOptimize.minNumFiles", "8")
    for i in range(7):
        t.write(
            spark.range(50 + i * 10, 60 + i * 10).selectExpr("id AS k").coalesce(1),
            mode="append",
        )
    adds, *_ = t._snapshot()
    assert len(adds) == 1, f"auto-compact should have packed to 1 file, saw {len(adds)}"
    assert sorted(r.k for r in t.read().collect()) == list(range(120))
    # the optimize landed as its own commit after the triggering write
    import glob
    import json

    ops = []
    for f in sorted(glob.glob(os.path.join(t.path, "_delta_log", "*.json"))):
        for line in open(f):
            a = json.loads(line)
            if "commitInfo" in a:
                ops.append(a["commitInfo"].get("operation"))
    assert "OPTIMIZE" in ops


def test_delta_auto_compact_below_threshold_is_noop(spark, tmp_path):
    t = DeltaLogTable(spark, str(tmp_path / "ac2"))
    t.write(spark.range(0, 50).selectExpr("id AS k").coalesce(1), mode="append")
    t.set_property("delta.autoOptimize.autoCompact", "true")
    t.write(spark.range(50, 60).selectExpr("id AS k").coalesce(1), mode="append")
    adds, *_ = t._snapshot()
    assert len(adds) == 2, "below minNumFiles the hook must not rewrite"


def test_iceberg_append_rebases_over_concurrent_commit(spark, tmp_path):
    """Commit staleness gate + fast-append rebase: a competitor commit
    landing between an append's planning read and its metadata write
    must either fail the append LOUDLY (retries=0 — previously a
    silent lost update) or be rebased over (retries>0), with BOTH
    appends visible and lineage ids disjoint."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    path = str(tmp_path / "race")
    t1, t2 = IcebergTable(spark, path), IcebergTable(spark, path)
    t1.append(spark.range(0, 10).selectExpr("id AS k").coalesce(1).limit(0))
    t1.enable_row_lineage()
    t1.append(spark.range(0, 10).selectExpr("id AS k").coalesce(1))

    def arm_race(target):
        orig = target._prior_manifest_rows
        fired = {"n": 0}

        def hook(meta, snaps, head_id=None):
            if fired["n"] == 0:
                fired["n"] = 1
                t2.append(
                    spark.range(100, 120).selectExpr("id AS k").coalesce(1)
                )
            return orig(meta, snaps, head_id=head_id)

        target._prior_manifest_rows = hook
        return target

    # retries=0: loud loss, nothing committed by the loser
    arm_race(IcebergTable(spark, path))
    loser = IcebergTable(spark, path)
    loser._prior_manifest_rows  # plain handle sanity
    racer = arm_race(IcebergTable(spark, path))
    with pytest.raises(RuntimeError, match="lost the race|was taken"):
        racer.append(spark.range(200, 205).selectExpr("id AS k").coalesce(1))
    n_after_loud = IcebergTable(spark, path).read().count()
    assert n_after_loud == 30, "competitor's append must survive the loud loss"

    # retries>0: rebase — both appends land, ids stay disjoint
    racer2 = arm_race(IcebergTable(spark, path))
    racer2.append(
        spark.range(300, 305).selectExpr("id AS k").coalesce(1), retries=3
    )
    t = IcebergTable(spark, path)
    rows = t.read_with_lineage().collect()
    # exact expectation: 0-9, two competitor batches (100-119 twice), 300-304
    from collections import Counter

    cnt = Counter(r.k for r in rows)
    assert all(cnt[k] == 1 for k in range(0, 10))
    assert all(cnt[k] == 2 for k in range(100, 120))
    assert all(cnt[k] == 1 for k in range(300, 305))
    ids = [r._row_id for r in rows]
    assert len(ids) == len(set(ids)), "row-id ranges collided across the rebase"


def test_delta_multipart_checkpoint_roundtrip(spark, tmp_path):
    """Multi-part CLASSIC checkpoint writes: N part files + parts in
    _last_checkpoint; a reader bootstraps through them with the
    covered JSON commits deleted (the q254 proof shape)."""
    import glob
    import json as _json

    t = DeltaLogTable(spark, str(tmp_path / "mp"))
    for i in range(4):
        t.write(
            spark.range(i * 25, i * 25 + 25).selectExpr("id AS k").coalesce(1),
            mode="append",
        )
    t.delete("k % 10 = 1")
    t.checkpoint(parts=3)
    part_files = sorted(
        glob.glob(str(tmp_path / "mp" / "_delta_log" / "*.checkpoint.*.0000000003.parquet"))
    )
    assert len(part_files) == 3
    d = _json.load(open(str(tmp_path / "mp" / "_delta_log" / "_last_checkpoint")))
    assert d["parts"] == 3
    # delete every covered JSON commit: the snapshot must bootstrap
    # purely from the checkpoint parts
    for f in glob.glob(str(tmp_path / "mp" / "_delta_log" / "*.json")):
        v = int(os.path.basename(f).split(".")[0])
        if v <= d["version"]:
            os.remove(f)
    fresh = DeltaLogTable(spark, str(tmp_path / "mp"))
    ks = sorted(r.k for r in fresh.read().collect())
    assert ks == [k for k in range(100) if k % 10 != 1]
    # post-checkpoint writes still apply on top
    fresh.write(spark.range(200, 205).selectExpr("id AS k").coalesce(1), mode="append")
    assert DeltaLogTable(spark, str(tmp_path / "mp")).read().count() == 90 + 5


def _arm_append_race(spark, path, lo=100, hi=110):
    """Instance whose first _prior_manifest_rows call lets a competitor
    append land first — the planning-read/commit-write race window."""
    target = IcebergTable(spark, path)
    competitor = IcebergTable(spark, path)
    orig = target._prior_manifest_rows
    fired = {"n": 0}

    def hook(meta, snaps, head_id=None):
        if fired["n"] == 0:
            fired["n"] = 1
            competitor.append(
                spark.range(lo, hi).selectExpr("id AS k", "id % 2 AS grp").coalesce(1)
            )
        return orig(meta, snaps, head_id=head_id)

    target._prior_manifest_rows = hook
    return target


@pytest.mark.parametrize("mode", ["mor", "dv", "cow"])
def test_iceberg_delete_rebases_over_concurrent_append(spark, tmp_path, mode):
    """VERDICT r9 item 5: a row-level DELETE losing the commit race to
    a BLIND APPEND must fail loudly at retries=0 (no partial effect)
    and rebase at retries>0 — the winner's rows all survive (the
    delete was planned before them; WriteSerializable semantics), the
    planned rows are gone, and nothing else changes. All three delete
    encodings (position deletes, v3 deletion vectors, copy-on-write)
    share the rebase."""
    path = str(tmp_path / f"race_{mode}")
    base = IcebergTable(spark, path)
    base.append(spark.range(0, 20).selectExpr("id AS k", "id % 2 AS grp").coalesce(1))

    # retries=0: loud loss — competitor's append survives, delete is a no-op
    racer = _arm_append_race(spark, path)
    with pytest.raises(RuntimeError, match="lost the race"):
        racer.delete("k < 5", mode=mode)
    assert IcebergTable(spark, path).read().count() == 30

    # retries>0: rebase — delete lands on top of the winner's append
    racer2 = _arm_append_race(spark, path)
    res = racer2.delete("k < 5", mode=mode, retries=3)
    assert res["rows_deleted"] == 5
    ks = sorted(r.k for r in IcebergTable(spark, path).read().collect())
    assert ks == list(range(5, 20)) + sorted([*range(100, 110)] * 2)


def test_iceberg_delete_refuses_rebase_over_row_level_winner(spark, tmp_path):
    """The rebase is append-only: when the race winner itself made a
    row-level change (here another DELETE), retrying must stay a loud
    loss — the planned change may target rows the winner moved."""
    path = str(tmp_path / "race_rowlevel")
    base = IcebergTable(spark, path)
    base.append(spark.range(0, 20).selectExpr("id AS k", "id % 2 AS grp").coalesce(1))

    target = IcebergTable(spark, path)
    competitor = IcebergTable(spark, path)
    orig = target._prior_manifest_rows
    fired = {"n": 0}

    def hook(meta, snaps, head_id=None):
        if fired["n"] == 0:
            fired["n"] = 1
            competitor.delete("k >= 18", mode="mor")
        return orig(meta, snaps, head_id=head_id)

    target._prior_manifest_rows = hook
    with pytest.raises(RuntimeError, match="cannot rebase"):
        target.delete("k < 5", mode="mor", retries=3)
    # winner's delete survives; loser's never applied
    ks = sorted(r.k for r in IcebergTable(spark, path).read().collect())
    assert ks == list(range(0, 18))


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_iceberg_update_rebases_over_concurrent_append(spark, tmp_path, mode):
    """UPDATE twin of the delete rebase: losing to a blind append at
    retries>0 rebases (with row lineage ON, the staged files embed the
    planned sequence, so the rebase re-stages them — asserted via the
    updated rows' _last_updated_sequence_number matching the FINAL
    committed sequence, not the pre-race one)."""
    path = str(tmp_path / f"upd_race_{mode}")
    base = IcebergTable(spark, path)
    base.append(
        spark.range(0, 1).selectExpr("id AS k", "CAST(0 AS LONG) AS v").limit(0).coalesce(1)
    )
    base.enable_row_lineage()
    base.append(spark.range(0, 20).selectExpr("id AS k", "CAST(id AS LONG) AS v").coalesce(1))

    target = IcebergTable(spark, path)
    competitor = IcebergTable(spark, path)
    orig = target._prior_manifest_rows
    fired = {"n": 0}

    def hook(meta, snaps, head_id=None):
        if fired["n"] == 0:
            fired["n"] = 1
            competitor.append(
                spark.range(100, 110).selectExpr("id AS k", "CAST(id AS LONG) AS v").coalesce(1)
            )
        return orig(meta, snaps, head_id=head_id)

    target._prior_manifest_rows = hook
    res = target.update({"v": "v + 1000"}, predicate="k < 5", mode=mode, retries=3)
    assert res["rows_updated"] == 5
    t = IcebergTable(spark, path)
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[0] == 1000 and rows[4] == 1004 and rows[5] == 5
    assert all(rows[k] == k for k in range(100, 110)), "winner's append lost"
    # lineage: updated rows stamped with the FINAL sequence; ids kept
    lin = {r.k: (r._row_id, r._last_updated_sequence_number)
           for r in t.read_with_lineage().collect()}
    final_seq = int(t.metadata()["last-sequence-number"])
    assert all(lin[k][1] == final_seq for k in range(5)), (
        "re-stage under the rebased sequence did not happen"
    )
    ids = [i for i, _ in lin.values()]
    assert len(ids) == len(set(ids))


def test_iceberg_merge_rebases_over_concurrent_append(spark, tmp_path):
    """MERGE twin: upsert loses the race to a blind append, rebases at
    retries>0; updated rows keep their ids and carry the final
    sequence, inserts get fresh ids, the winner's rows survive."""
    path = str(tmp_path / "mrg_race")
    base = IcebergTable(spark, path)
    base.append(
        spark.range(0, 1).selectExpr("id AS k", "CAST(0 AS LONG) AS v").limit(0).coalesce(1)
    )
    base.enable_row_lineage()
    base.append(spark.range(0, 10).selectExpr("id AS k", "CAST(id AS LONG) AS v").coalesce(1))

    target = IcebergTable(spark, path)
    competitor = IcebergTable(spark, path)
    orig = target._prior_manifest_rows
    fired = {"n": 0}

    def hook(meta, snaps, head_id=None):
        if fired["n"] == 0:
            fired["n"] = 1
            competitor.append(
                spark.range(100, 105).selectExpr("id AS k", "CAST(id AS LONG) AS v").coalesce(1)
            )
        return orig(meta, snaps, head_id=head_id)

    target._prior_manifest_rows = hook
    src = spark.range(5, 15).selectExpr("id AS k", "CAST(id * 10 AS LONG) AS v").coalesce(1)
    res = target.merge(src, on=["k"], retries=3)
    assert res["rows_updated"] == 5 and res["rows_inserted"] == 5
    t = IcebergTable(spark, path)
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[5] == 50 and rows[14] == 140 and rows[0] == 0
    assert all(rows[k] == k for k in range(100, 105)), "winner's append lost"
    lin = {r.k: (r._row_id, r._last_updated_sequence_number)
           for r in t.read_with_lineage().collect()}
    final_seq = int(t.metadata()["last-sequence-number"])
    assert all(lin[k][1] == final_seq for k in range(5, 15))
    ids = [i for i, _ in lin.values()]
    assert len(ids) == len(set(ids)), "row-id ranges collided across the rebase"


def test_iceberg_concurrent_writers_stress(spark, tmp_path):
    """Real-thread contention (not an injected hook): six appenders
    race on one table with retries — every batch must land EXACTLY
    once (fast-append rebase under genuine O_EXCL losses), and a
    MoR delete racing the appenders rebases over them and removes
    exactly its pre-existing targets."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "stress")
    seed = IcebergTable(spark, path)
    seed.append(
        spark.range(0, 50).selectExpr("id AS k", "id % 5 AS g").coalesce(1)
    )

    def appender(i: int) -> int:
        t = IcebergTable(spark, path)
        return t.append(
            spark.range(1000 + i * 100, 1000 + i * 100 + 100)
            .selectExpr("id AS k", "id % 5 AS g")
            .coalesce(1),
            retries=25,
        )

    def deleter() -> dict:
        t = IcebergTable(spark, path)
        return t.delete("k < 10", mode="mor", retries=25)

    with ThreadPoolExecutor(max_workers=7) as ex:
        futs = [ex.submit(appender, i) for i in range(6)]
        dfut = ex.submit(deleter)
        snap_ids = [f.result() for f in futs]
        dres = dfut.result()

    assert len(set(snap_ids)) == 6, "two appends claimed the same snapshot"
    assert dres["rows_deleted"] == 10
    t = IcebergTable(spark, path)
    ks = sorted(r.k for r in t.read().collect())
    want = list(range(10, 50)) + list(range(1000, 1600))
    assert ks == want, (len(ks), len(want))
    # the log is a clean linear history: snapshot ids are unique and
    # the final snapshot count covers every commit exactly once
    snaps = t.snapshots()
    ids = [s["snapshot-id"] for s in snaps]
    assert len(ids) == len(set(ids)) == 8  # seed + 6 appends + delete


def test_iceberg_hilbert_compact_prunes_both_dims(spark, tmp_path):
    """compact(hilbert_by=...) — the liquid-clustering curve on the
    Iceberg side (q371's Morton sibling, shared _hilbert_value
    kernel): rewritten files prune on EITHER clustered column via
    manifest bounds, and content is unchanged."""
    from ent_fins_lakehouse_spark.sources.skipping import prune_dirs

    path = str(tmp_path / "hz")
    t = IcebergTable(spark, path)
    df = spark.range(0, 40000).selectExpr(
        "id AS a", "CAST(pmod(id * 2654435761, 40000) AS LONG) AS b"
    )
    t.append(df.repartition(16))
    before = sorted(r.a for r in t.read().collect())
    st = t.compact(target_files=16, hilbert_by=["a", "b"])
    assert st["files_after"] >= 8
    data, *_ = t._files_full()
    stats = {p: b for p, _, b in data}
    for pred in ("a <= 2000", "b <= 2000"):
        cand, _ = prune_dirs(pred, stats, [p for p, _, _ in data])
        assert len(data) - len(cand) >= 4, (pred, len(cand), len(data))
    assert sorted(r.a for r in t.read().collect()) == before


def test_iceberg_fsck_repair(spark, tmp_path):
    """FSCK REPAIR (Delta parity): out-of-band deletion of a data file
    and a position-delete file breaks reads; dry_run reports both;
    repair drops exactly their entries in one snapshot — survivors
    (including delete semantics on INTACT files) keep serving, and
    time travel still sees the pre-repair metadata."""
    import os

    path = str(tmp_path / "fsck")
    t = IcebergTable(spark, path)
    t.append(spark.range(0, 10).selectExpr("id AS k").coalesce(1))
    t.append(spark.range(10, 20).selectExpr("id AS k").coalesce(1))
    t.delete("k = 15", mode="mor")  # pos-delete on an INTACT file
    t.delete("k = 3", mode="mor")  # pos-delete file we will remove

    data, pos_deletes, *_ = t._files_full()
    victim_data = next(
        p for p, _, b in data if b and b.get("k") and int(b["k"][0]) == 10
    )
    # the delete parquet whose masked position is 3 (k=3 in file one)
    import pyarrow.parquet as pq

    victim_del = next(
        p for p in pos_deletes if 3 in pq.read_table(p).column("pos").to_pylist()
    )
    os.remove(victim_data)
    os.remove(victim_del)

    rep = t.fsck_repair(dry_run=True)
    assert rep["n_missing"] == 2 and sorted(rep["missing"]) == sorted(
        [victim_data, victim_del]
    )
    rep2 = t.fsck_repair()
    assert rep2["n_missing"] == 2
    fresh = IcebergTable(spark, path)
    ks = sorted(r.k for r in fresh.read().collect())
    # second file (10..19) gone; k=3's delete file gone so k=3 is back;
    # k=15 lived in the removed file anyway
    assert ks == list(range(0, 10))
    assert fresh.fsck_repair(dry_run=True)["n_missing"] == 0
