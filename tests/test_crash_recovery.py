"""Crash-window fault injection for multi-step commits (VERDICT r10
item 6).

Every compound write in the engine follows stage-then-commit: data
files / DV sidecars / _change_data files / checkpoint sidecars /
manifests land on disk FIRST, and only the final O_EXCL log or
metadata.json commit makes them visible. A writer killed inside that
window must leave the table fully readable at its pre-crash state, and
the maintenance verbs (VACUUM / remove_orphan_files) must reclaim the
orphaned debris. These tests raise mid-sequence (the injected "kill")
and assert both halves.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


class _Boom(RuntimeError):
    """The injected crash."""


def _delta(spark, path, rows=100):
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    t = DeltaLogTable(spark, str(path))
    t.write(spark.range(rows).selectExpr("id", "id % 7 AS k").coalesce(2), mode="overwrite")
    return t


def _data_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        if "_delta_log" in dirpath:
            continue
        for f in files:
            if f.endswith(".parquet") or f.endswith(".bin"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def test_delta_append_crash_before_log_commit(spark, tmp_path, monkeypatch):
    """Kill between parquet staging and the O_EXCL log write: readers
    never see the staged files, VACUUM reclaims them, and the retried
    append lands cleanly at the same version."""
    t = _delta(spark, tmp_path / "t")
    v0 = t.latest_version()
    before = set(_data_files(t.path))

    orig = type(t)._commit_actions

    def boom(self, version, actions):
        raise _Boom("killed before log commit")

    monkeypatch.setattr(type(t), "_commit_actions", boom)
    with pytest.raises(_Boom):
        t.write(spark.range(100, 150).selectExpr("id", "id % 7 AS k").coalesce(1))
    monkeypatch.setattr(type(t), "_commit_actions", orig)

    # reader sees the pre-crash state; the staged parquet is orphaned
    assert t.latest_version() == v0
    assert t.read().count() == 100
    orphans = set(_data_files(t.path)) - before
    assert orphans, "crash should have left staged files behind"

    removed = t.vacuum(retention_hours=0.0)
    assert orphans <= {os.path.join(t.path, r) if not os.path.isabs(r) else r for r in removed} | set(
        removed
    ) or not (set(_data_files(t.path)) & orphans), "VACUUM must reclaim the staged orphans"
    assert not (set(_data_files(t.path)) & orphans)

    # the retried write commits at v0+1 and reads back whole
    t.write(spark.range(100, 150).selectExpr("id", "id % 7 AS k").coalesce(1))
    assert t.latest_version() == v0 + 1
    assert t.read().count() == 150


def test_delta_dv_delete_crash_before_log_commit(spark, tmp_path, monkeypatch):
    """Kill a DV DELETE after the deletion-vector sidecar is staged:
    the full row set stays visible, the orphan DV bin is vacuumable,
    and the retried delete applies once."""
    t = _delta(spark, tmp_path / "t")
    before = set(_data_files(t.path))
    orig = type(t)._commit_actions

    def boom(self, version, actions):
        raise _Boom("killed before log commit")

    monkeypatch.setattr(type(t), "_commit_actions", boom)
    with pytest.raises(_Boom):
        t.delete("k = 3")
    monkeypatch.setattr(type(t), "_commit_actions", orig)

    assert t.read().count() == 100, "uncommitted DV must not mask rows"
    orphans = set(_data_files(t.path)) - before
    assert any(p.endswith(".bin") for p in orphans), "expected a staged DV sidecar"

    t.vacuum(retention_hours=0.0)
    assert not (set(_data_files(t.path)) & orphans)

    t.delete("k = 3")
    assert t.read().filter("k = 3").count() == 0
    assert t.read().count() == 86  # 14 ids ≡ 3 (mod 7) in [0, 100)


def test_delta_cdf_dml_crash_before_log_commit(spark, tmp_path, monkeypatch):
    """Kill a CDF UPDATE after _change_data staging: read_changes over
    the committed range is unaffected, the orphan cdc parquet is
    reclaimed, and the retried update emits exactly one change set."""
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    t = DeltaLogTable(spark, str(tmp_path / "t"))
    t.write(spark.range(100).selectExpr("id", "id % 7 AS k").coalesce(2), mode="overwrite")
    t.set_property("delta.enableChangeDataFeed", "true")
    v_cdf = t.latest_version()
    before = set(_data_files(t.path))

    orig = type(t)._commit_actions

    def boom(self, version, actions):
        raise _Boom("killed before log commit")

    monkeypatch.setattr(type(t), "_commit_actions", boom)
    with pytest.raises(_Boom):
        t.update({"k": "k + 100"}, "k = 2")
    monkeypatch.setattr(type(t), "_commit_actions", orig)

    assert t.latest_version() == v_cdf
    assert t.read().filter("k >= 100").count() == 0
    orphans = set(_data_files(t.path)) - before
    assert any("_change_data" in p for p in orphans), "expected staged cdc files"

    t.vacuum(retention_hours=0.0)
    assert not (set(_data_files(t.path)) & orphans)

    t.update({"k": "k + 100"}, "k = 2")
    changes = t.read_changes(v_cdf + 1)
    kinds = {r["_change_type"] for r in changes.select("_change_type").distinct().collect()}
    assert kinds == {"update_preimage", "update_postimage"}
    assert changes.filter("_change_type = 'update_postimage'").count() == 14


def test_delta_v2_checkpoint_crash_after_sidecar(spark, tmp_path, monkeypatch):
    """Kill a V2 checkpoint between the sidecar parquet and the
    top-level checkpoint file: the log replays fine without the
    checkpoint, the orphan sidecar is reclaimed, and the retried
    checkpoint bootstraps a fresh reader."""
    import pyarrow.parquet as pq

    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    t = _delta(spark, tmp_path / "t")
    t.set_property("delta.checkpointPolicy", "v2")
    t.write(spark.range(100, 120).selectExpr("id", "id % 7 AS k").coalesce(1))
    v = t.latest_version()

    calls = {"n": 0}
    orig_write = pq.write_table

    def boom_second(table, where, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # sidecar written, top-level file "crashes"
            raise _Boom("killed between sidecar and checkpoint")
        return orig_write(table, where, *a, **kw)

    monkeypatch.setattr(pq, "write_table", boom_second)
    with pytest.raises(_Boom):
        t.checkpoint(v)
    monkeypatch.setattr(pq, "write_table", orig_write)

    sc_dir = os.path.join(t.path, "_delta_log", "_sidecars")
    orphan_sidecars = set(os.listdir(sc_dir))
    assert orphan_sidecars, "expected an orphaned sidecar"
    assert not os.path.exists(os.path.join(t.path, "_delta_log", "_last_checkpoint"))

    # a fresh reader replays the JSON log, unaffected by the debris
    t2 = DeltaLogTable(spark, t.path)
    assert t2.read().count() == 120

    # retried checkpoint succeeds; vacuum reclaims the unreferenced sidecar
    t.checkpoint(v)
    t.vacuum(retention_hours=0.0)
    live = set(os.listdir(sc_dir))
    assert not (live & orphan_sidecars), "orphan sidecar must be reclaimed"

    t3 = DeltaLogTable(spark, t.path)
    assert t3.read().count() == 120


def test_iceberg_append_crash_before_metadata_commit(spark, tmp_path, monkeypatch):
    """Kill an Iceberg append between manifest staging and the
    metadata.json commit: snapshots and reads are unaffected,
    remove_orphan_files reclaims the staged data + manifests, and the
    retried append lands."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "t"))
    t.append(spark.range(100).selectExpr("id", "id % 7 AS k").coalesce(2))
    n_snaps = len(t.snapshots())

    def _all_files(root):
        return sorted(
            os.path.join(d, f) for d, _dd, fs in os.walk(root) for f in fs
        )

    before = set(_all_files(t.path))
    orig = type(t)._commit_snapshot

    def boom(self, *a, **kw):
        raise _Boom("killed before manifest-list/metadata commit")

    monkeypatch.setattr(type(t), "_commit_snapshot", boom)
    with pytest.raises(_Boom):
        t.append(spark.range(100, 150).selectExpr("id", "id % 7 AS k").coalesce(1))
    monkeypatch.setattr(type(t), "_commit_snapshot", orig)

    assert len(t.snapshots()) == n_snaps
    assert t.read().count() == 100
    orphans = set(_all_files(t.path)) - before
    assert orphans, "crash should have left staged files behind"

    t.remove_orphan_files(older_than_hours=0)
    assert not (set(_all_files(t.path)) & orphans), "orphans must be reclaimed"

    t.append(spark.range(100, 150).selectExpr("id", "id % 7 AS k").coalesce(1))
    assert t.read().count() == 150


def test_iceberg_mor_delete_crash_before_metadata_commit(spark, tmp_path, monkeypatch):
    """Kill a merge-on-read DELETE after its delete-file artifacts are
    staged: no row disappears, the staged artifacts are reclaimed, and
    the retried delete masks exactly the predicate rows."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "t"))
    t.append(spark.range(100).selectExpr("id", "id % 7 AS k").coalesce(2))

    def _all_files(root):
        return sorted(
            os.path.join(d, f) for d, _dd, fs in os.walk(root) for f in fs
        )

    before = set(_all_files(t.path))
    orig = type(t)._commit_snapshot

    def boom(self, *a, **kw):
        raise _Boom("killed before manifest-list/metadata commit")

    monkeypatch.setattr(type(t), "_commit_snapshot", boom)
    with pytest.raises(_Boom):
        t.delete("k = 3", mode="mor")
    monkeypatch.setattr(type(t), "_commit_snapshot", orig)

    assert t.read().count() == 100, "uncommitted delete must not mask rows"
    orphans = set(_all_files(t.path)) - before

    t.remove_orphan_files(older_than_hours=0)
    assert not (set(_all_files(t.path)) & orphans)

    t.delete("k = 3", mode="mor")
    assert t.read().filter("k = 3").count() == 0
    assert t.read().count() == 86  # 14 ids ≡ 3 (mod 7) in [0, 100)


def test_uniform_twin_sync_crash_self_heals(spark, tmp_path, monkeypatch):
    """Kill the UniForm Iceberg twin sync AFTER the Delta commit is
    durable: Delta stays fully readable, and the next commit's
    anchor-diff sync converges the twin to the live state."""
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    t = DeltaLogTable(spark, str(tmp_path / "t"))
    t.write(spark.range(50).selectExpr("id", "id % 7 AS k").coalesce(1), mode="overwrite")
    t.set_property("delta.universalFormat.enabledFormats", "iceberg")
    # first post-enablement commit converts the twin
    t.write(spark.range(50, 60).selectExpr("id", "id % 7 AS k").coalesce(1))
    assert t.uniform_status() is not None

    orig = type(t)._sync_uniform

    def boom(self):
        raise _Boom("killed during twin sync")

    monkeypatch.setattr(type(t), "_sync_uniform", boom)
    try:
        t.write(spark.range(60, 80).selectExpr("id", "id % 7 AS k").coalesce(1))
    except _Boom:
        pass  # the commit itself must already be durable either way
    monkeypatch.setattr(type(t), "_sync_uniform", orig)

    assert t.read().count() == 80, "Delta commit must be durable despite twin crash"

    # next commit self-heals the twin (anchor-diff catches up)
    t.write(spark.range(80, 90).selectExpr("id", "id % 7 AS k").coalesce(1))
    status = t.uniform_status()
    assert status is not None

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    twin = IcebergTable(spark, t.path)
    assert twin.read().count() == t.read().count() == 90


def _replay_cdf_state(t, upto: int) -> dict:
    """Net-replay the CDF from version 0 — the log IS the spec of the
    content, so a kill can land anywhere and this still defines the
    expected final state."""
    changes = t.read_changes(0, upto).select(
        "k", "v", "_change_type", "_commit_version"
    ).collect()
    state: dict = {}
    for ver in range(0, upto + 1):
        batch = [r for r in changes if r["_commit_version"] == ver]
        for r in batch:
            if r["_change_type"] in ("delete", "update_preimage"):
                state.pop(r["k"], None)
        for r in batch:
            if r["_change_type"] in ("insert", "update_postimage"):
                state[r["k"]] = r["v"]
    return state


def test_sigkill_storm_delta_and_iceberg(spark, tmp_path):
    """TRUE kill -9 crash storm (beyond this file's exception-injection
    windows, which only cover the crash points someone thought of): a
    writer process — own SparkSession, own JVM — loops small
    append/DELETE/OPTIMIZE commits while the parent SIGKILLs its whole
    session group at a random moment, repeatedly, against the same two
    tables. No finally/atexit runs. After every kill the table must be
    fully readable with dense versions, a valid checksum, every log
    file parseable (no torn commit), CDF net-replay == content (Delta),
    a linear metadata chain (Iceberg) — and a fresh writer must commit
    on top without manual repair."""
    import json as _json
    import random
    import signal
    import subprocess
    import sys as _sys
    import time

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    dpath, ipath = str(tmp_path / "d"), str(tmp_path / "i")
    dt = DeltaLogTable(spark, dpath)
    dt.write(spark.createDataFrame([(-1, "seed")], "k LONG, v STRING"), mode="append")
    dt.set_property("delta.enableChangeDataFeed", "true")
    it = IcebergTable(spark, ipath)
    it.append(spark.createDataFrame([(-1, "seed")], "k LONG, v STRING").coalesce(1))

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_crash_worker.py")
    rng = random.Random(14_003)

    def commit_count(kind: str, path: str) -> int:
        # count landed commits straight off disk so the poll never
        # touches the table classes mid-storm
        if kind == "delta":
            d = os.path.join(path, "_delta_log")
            names = os.listdir(d) if os.path.isdir(d) else []
            return sum(1 for f in names if f.endswith(".json") and f[:-5].isdigit())
        d = os.path.join(path, "metadata")
        names = os.listdir(d) if os.path.isdir(d) else []
        return sum(1 for f in names if f.endswith(".metadata.json"))

    def one_round(kind: str, path: str) -> None:
        log = open(str(tmp_path / f"crash_{kind}.log"), "a")
        c0 = commit_count(kind, path)
        p = subprocess.Popen(
            [_sys.executable, worker, kind, path],
            stdout=log,
            stderr=subprocess.STDOUT,
            start_new_session=True,  # kill the JVM with the python
        )
        try:
            # wait until the worker has actually landed >=2 new commits
            # (a fixed sleep made the storm vacuous on contended hosts
            # where JVM startup ate the whole window), then kill at a
            # random in-flight moment; generous cap for loaded hosts
            deadline = time.monotonic() + 180.0
            while time.monotonic() < deadline:
                if p.poll() is not None:
                    break  # worker died on its own — surface via asserts
                if commit_count(kind, path) >= c0 + 2:
                    break
                time.sleep(0.25)
            time.sleep(rng.uniform(0.0, 3.0))
        finally:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass
            p.wait(30)
            log.close()

    d_v0 = dt.latest_version()
    i_s0 = len(it.snapshots())
    for rnd in range(2):
        for kind, path in (("delta", dpath), ("iceberg", ipath)):
            one_round(kind, path)
            if kind == "delta":
                t2 = DeltaLogTable(spark, path)
                final = t2.latest_version()
                assert sorted(t2._json_versions()) == list(range(final + 1)), (
                    "versions must stay dense through kill -9"
                )
                # every visible commit parses completely — no torn JSON
                for v, fp in sorted(t2._json_versions().items()):
                    with open(fp) as fh:
                        for line in fh:
                            if line.strip():
                                _json.loads(line)
                t2.validate_checksum()
                content = {
                    r["k"]: r["v"] for r in t2.read().select("k", "v").collect()
                }
                assert content == _replay_cdf_state(t2, final), (
                    f"round {rnd}: CDF replay diverged from content"
                )
            else:
                t2 = IcebergTable(spark, path)
                metas = [
                    f
                    for f in os.listdir(os.path.join(path, "metadata"))
                    if f.endswith(".metadata.json")
                ]
                ns = sorted(int(f[1 : -len(".metadata.json")]) for f in metas)
                assert ns == list(range(1, len(ns) + 1)), (
                    "metadata chain must stay linear through kill -9"
                )
                snaps = t2.snapshots()
                ids = [s["snapshot-id"] for s in snaps]
                assert len(ids) == len(set(ids))
                assert t2.read().filter("k = -1").count() == 1

    # the storm must have actually exercised the commit path — a kill
    # landing before any commit every round would make the invariants
    # vacuous
    assert DeltaLogTable(spark, dpath).latest_version() >= d_v0 + 4, (
        "delta writer never got commits in before the kills — storm vacuous"
    )
    assert len(IcebergTable(spark, ipath).snapshots()) >= i_s0 + 4, (
        "iceberg writer never got commits in before the kills — storm vacuous"
    )

    # crash debris reclaim under real kill -9: VACUUM(0h) +
    # remove_orphan_files(0h) sweep whatever the killed writers left
    # staged/unreferenced, WITHOUT changing either table's content
    # (0-hour horizons are safe here: no writer is live)
    dt_pre = {r["k"]: r["v"] for r in DeltaLogTable(spark, dpath).read().collect()}
    removed_d = DeltaLogTable(spark, dpath).vacuum(retention_hours=0.0)
    it_pre = {r["k"]: r["v"] for r in IcebergTable(spark, ipath).read().collect()}
    removed_i = IcebergTable(spark, ipath).remove_orphan_files(older_than_hours=0.0)
    assert {r["k"]: r["v"] for r in DeltaLogTable(spark, dpath).read().collect()} == dt_pre
    assert {r["k"]: r["v"] for r in IcebergTable(spark, ipath).read().collect()} == it_pre
    for root_dir in (dpath, ipath):
        leftovers = []
        for root, _dirs, fns in os.walk(root_dir):
            leftovers += [f for f in fns if f.endswith(".tmp")]
        assert leftovers == [], f"publish staging residue survived the sweep: {leftovers[:3]}"

    # a fresh writer commits on top of the killed log, no manual repair
    dt3 = DeltaLogTable(spark, dpath)
    v_before = dt3.latest_version()
    dt3.write(
        spark.createDataFrame([(777, "post")], "k LONG, v STRING"), mode="append"
    )
    assert dt3.latest_version() == v_before + 1
    assert dt3.read().filter("k = 777").count() == 1
    it3 = IcebergTable(spark, ipath)
    it3.append(spark.createDataFrame([(888, "post")], "k LONG, v STRING").coalesce(1))
    assert it3.read().filter("k = 888").count() == 1
