"""Streaming semantics tests (SURVEY.md §5.4): exactly-once ingestion,
idempotent re-run, watermark late-data dropping, lake-sink replay."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def _write_json(spark, rows, path):
    spark.createDataFrame(rows, "ts STRING, user_id LONG, v DOUBLE").write.mode(
        "append"
    ).json(path)


SCHEMA = "ts TIMESTAMP, user_id LONG, v DOUBLE"


def _run_windowed(spark, src, out, ckpt):
    """Append-mode 5-min windows with a 5-min watermark → parquet."""
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["ws"]: r["n"] for r in spark.read.schema("ws STRING, n LONG").parquet(out).collect()}


def test_watermark_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # run 1: events at 10:00, 10:02, then 10:20 → watermark reaches 10:15
    _write_json(spark, [("2024-01-01 10:00:00", 1, 1.0), ("2024-01-01 10:02:00", 1, 1.0)], src)
    _write_json(spark, [("2024-01-01 10:20:00", 1, 1.0)], src)
    emitted1 = _run_windowed(spark, src, out, ckpt)
    # the [10:00,10:05) window closed (end 10:05 <= watermark 10:15) → emitted
    assert emitted1.get("10:00") == 2, emitted1
    assert "10:20" not in emitted1  # still open

    # run 2: a late event at 10:01 (behind the persisted 10:15 watermark)
    # plus a fresh event at 10:40 that pushes the watermark past 10:25
    _write_json(spark, [("2024-01-01 10:01:00", 1, 99.0), ("2024-01-01 10:40:00", 1, 1.0)], src)
    emitted2 = _run_windowed(spark, src, out, ckpt)
    # late row dropped: the already-emitted 10:00 window is NOT re-emitted
    # (still counts 2) and no duplicate/extra row appears for it
    assert emitted2.get("10:00") == 2, emitted2
    # the 10:20 window finalized once watermark passed 10:25
    assert emitted2.get("10:20") == 1, emitted2


def test_ingest_idempotent_rerun(spark, tmp_path):
    from ent_fins_lakehouse_spark.streaming.autoloader import ingest_file_stream, run_available_now

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_json(spark, [("2024-01-01 00:00:00", 1, 1.0)], src)
    target, ckpt = str(tmp_path / "t"), str(tmp_path / "c")

    run_available_now(ingest_file_stream(spark, src, SCHEMA), target, ckpt)
    assert spark.read.schema(SCHEMA).parquet(target).count() == 1
    # re-run with no new files → no new rows (Auto Loader demo.py:123-131)
    run_available_now(ingest_file_stream(spark, src, SCHEMA), target, ckpt)
    assert spark.read.schema(SCHEMA).parquet(target).count() == 1
    # a new file arrives → exactly the delta is ingested
    _write_json(spark, [("2024-01-01 00:01:00", 2, 2.0)], src)
    run_available_now(ingest_file_stream(spark, src, SCHEMA), target, ckpt)
    assert spark.read.schema(SCHEMA).parquet(target).count() == 2


def test_lake_sink_replay_is_exactly_once(spark, tmp_path):
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable
    from ent_fins_lakehouse_spark.streaming.autoloader import LakeStreamSink

    t = LakeTable(spark, str(tmp_path / "lake"))
    sink = LakeStreamSink(t)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    sink.write_batch(df, batch_id=0)
    assert t.read().count() == 2
    # simulated checkpoint-replay of the same microbatch → skipped
    sink.write_batch(df, batch_id=0)
    assert t.read().count() == 2
    sink.write_batch(df, batch_id=1)
    assert t.read().count() == 4


class TestLakeStreamSource:
    """S5: LakeTable as a streaming source (streaming/lake_source.py)."""

    def _drain(self, spark, path, out, ckpt, **kw):
        from ent_fins_lakehouse_spark.streaming.lake_source import read_lake_stream

        q = (
            read_lake_stream(spark, path, **kw)
            .writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("checkpointLocation", ckpt)
            .start(out)
        )
        q.awaitTermination()
        return sorted(r["id"] for r in spark.read.parquet(out).collect())

    def test_exactly_once_incremental(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

        t = LakeTable(spark, str(tmp_path / "tbl"))
        t.write(spark.range(5).withColumn("v", F.col("id") * 10), mode="overwrite")
        t.insert_into(spark.range(5, 8).withColumn("v", F.col("id") * 10))
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        assert self._drain(spark, t.path, out, ckpt) == list(range(8))
        # re-trigger with nothing new: no duplicates
        assert self._drain(spark, t.path, out, ckpt) == list(range(8))
        # append streams only the delta
        t.insert_into(spark.range(8, 10).withColumn("v", F.col("id") * 10))
        assert self._drain(spark, t.path, out, ckpt) == list(range(10))

    def test_rewrite_aborts_without_ignore_changes(self, spark, tmp_path):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

        t = LakeTable(spark, str(tmp_path / "tbl"))
        t.write(spark.range(5).withColumn("v", F.col("id")), mode="overwrite")
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        assert self._drain(spark, t.path, out, ckpt) == list(range(5))
        t.delete("id = 3")
        with _pytest.raises(Exception, match="rewrites data|STREAM_FAILED"):
            self._drain(spark, t.path, out, ckpt)
        # ignoreChanges skips the rewrite commit's adds-with-removes
        out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
        got = self._drain(spark, t.path, out2, ckpt2, ignore_changes=True)
        assert set(got) >= {0, 1, 2, 4}


class TestAutoLoaderEvolution:
    """Schema inference / evolution / _rescued_data (q147's machinery)."""

    def _land(self, path: str, *lines: str) -> None:
        import uuid as _uuid

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, f"{_uuid.uuid4().hex}.json"), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    def test_infer_then_widen_then_append_column(self, spark, tmp_path):
        from pyspark.sql import types as T

        from ent_fins_lakehouse_spark.streaming.autoloader import AutoLoader

        src, loc = str(tmp_path / "src"), str(tmp_path / "loc")
        self._land(src, '{"id": 1, "v": 10}')
        al = AutoLoader(spark, src, loc)
        s0 = al.resolve_schema()
        assert [(f.name, f.dataType) for f in s0.fields] == [
            ("id", T.LongType()), ("v", T.LongType())]
        # drift: v becomes fractional (widen long->double), extra appears
        self._land(src, '{"id": 2, "v": 2.5, "extra": "e"}')
        s1 = al.resolve_schema()
        assert [(f.name, f.dataType) for f in s1.fields] == [
            ("id", T.LongType()), ("v", T.DoubleType()), ("extra", T.StringType())]
        # schema versions recorded like cloudFiles' _schemas dir
        assert al._stored_versions() == ["0.json", "1.json"]

    def test_rescued_data_buckets(self, spark, tmp_path):
        """Bad casts, unknown keys (evolution off) and corrupt lines
        all land in _rescued_data without failing the stream."""
        import json as _json

        from ent_fins_lakehouse_spark.streaming.autoloader import AutoLoader

        src, loc = str(tmp_path / "src"), str(tmp_path / "loc")
        self._land(src, '{"id": 1, "v": 10}')
        al = AutoLoader(spark, src, loc, schema_evolution=False)
        schema = al.resolve_schema()
        self._land(
            src,
            '{"id": "oops", "v": 20}',
            '{"id": 3, "v": 30, "mystery": "m"}',
            "garbage{",
        )
        out = AutoLoader.with_rescued_data(spark.read.text(src), schema)
        rows = {r["id"]: r for r in out.collect() if True}
        assert rows[1]["_rescued_data"] is None
        assert _json.loads(rows[3]["_rescued_data"]) == {"mystery": "m"}
        rescued = [r for r in out.collect() if r["id"] is None]
        buckets = [_json.loads(r["_rescued_data"]) for r in rescued]
        assert {"id": "oops"} in buckets
        assert {"_corrupt_record": "garbage{"} in buckets

    def test_unwidenable_conflict_keeps_stored_type(self, spark, tmp_path):
        from pyspark.sql import types as T

        from ent_fins_lakehouse_spark.streaming.autoloader import AutoLoader

        src, loc = str(tmp_path / "src"), str(tmp_path / "loc")
        self._land(src, '{"id": 1}')
        al = AutoLoader(spark, src, loc)
        al.resolve_schema()
        self._land(src, '{"id": "str-now"}')
        s1 = al.resolve_schema()
        # long vs string has no LUB: stored type wins, values rescue
        assert s1["id"].dataType == T.LongType()

    def test_evolving_stream_keeps_checkpoint(self, spark, tmp_path):
        """Exactly-once survives schema evolution: the second run with
        the SAME checkpoint ingests only the new file, with the wider
        schema, through a merge_schema sink."""
        from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable
        from ent_fins_lakehouse_spark.streaming.autoloader import AutoLoader, LakeStreamSink

        src, loc, ckpt = str(tmp_path / "src"), str(tmp_path / "loc"), str(tmp_path / "ck")
        self._land(src, '{"id": 1, "v": 10}', '{"id": 2, "v": 20}')
        al = AutoLoader(spark, src, loc)
        t = LakeTable(spark, str(tmp_path / "tbl"))
        sink = LakeStreamSink(t, merge_schema=True)
        sink.start(al.stream(), ckpt)
        assert t.read().count() == 2
        self._land(src, '{"id": 3, "v": 30, "extra": "e"}')
        sink.start(al.stream(), ckpt)
        got = {r["id"]: r for r in t.read().collect()}
        assert len(got) == 3  # no re-ingest of wave 1
        assert got[3]["extra"] == "e" and got[1]["extra"] is None


class TestDeltaStreamSource:
    """Streaming from the public _delta_log format (q155's source)."""

    def _drain(self, spark, src, out, ckpt, ignore_changes=False):
        from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
        from ent_fins_lakehouse_spark.streaming.delta_source import read_delta_stream

        run_available_now(read_delta_stream(spark, src, ignore_changes), out, ckpt)
        return [r["id"] for r in spark.read.parquet(out).collect()]

    def test_appends_stream_exactly_once(self, spark, tmp_path):
        from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

        src, out, ckpt = str(tmp_path / "t"), str(tmp_path / "o"), str(tmp_path / "c")
        dl = DeltaLogTable(spark, src)
        dl.write(spark.createDataFrame([(1,), (2,)], "id INT"), mode="append")
        assert sorted(self._drain(spark, src, out, ckpt)) == [1, 2]
        dl.write(spark.createDataFrame([(3,)], "id INT"), mode="append")
        assert sorted(self._drain(spark, src, out, ckpt)) == [1, 2, 3]

    def test_initial_snapshot_applies_history_and_dvs(self, spark, tmp_path):
        """A NEW stream starts from the reconciled current snapshot
        (Delta's initial-snapshot semantics, ADVICE r5 #4): pre-stream
        rewrites — overwrites and DV deletes — need no ignoreChanges
        and emit no phantom rows from removed files."""
        from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

        src = str(tmp_path / "t")
        dl = DeltaLogTable(spark, src)
        dl.write(spark.createDataFrame([(7,), (8,)], "id INT"), mode="append")
        dl.write(
            spark.createDataFrame([(i,) for i in range(6)], "id INT"),
            mode="overwrite",  # historical rewrite BEFORE the stream
        )
        dl.delete("id = 2")  # DV delete BEFORE the stream
        out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
        got = self._drain(spark, src, out, ckpt)
        assert sorted(got) == [0, 1, 3, 4, 5]  # no 7/8 phantoms, no 2
        # appends after the snapshot tail normally
        dl.write(spark.createDataFrame([(9,)], "id INT"), mode="append")
        assert sorted(self._drain(spark, src, out, ckpt)) == [0, 1, 3, 4, 5, 9]

    def test_post_snapshot_rewrites_abort_without_ignore_changes(self, spark, tmp_path):
        from pyspark.errors.exceptions.captured import StreamingQueryException

        from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

        src = str(tmp_path / "t")
        dl = DeltaLogTable(spark, src)
        dl.write(spark.createDataFrame([(i,) for i in range(6)], "id INT"), mode="append")
        out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
        assert sorted(self._drain(spark, src, out, ckpt)) == [0, 1, 2, 3, 4, 5]
        dl.delete("id = 2")  # DV rewrite of already-streamed rows
        with pytest.raises(StreamingQueryException, match="ignoreChanges"):
            self._drain(spark, src, out, ckpt)
        # ignoreChanges skips the DV-bearing re-add (Delta's contract)
        got = self._drain(spark, src, out, ckpt, ignore_changes=True)
        assert sorted(got) == [0, 1, 2, 3, 4, 5]  # already streamed; no dupes


def test_delta_stream_rate_limit(spark, tmp_path):
    """maxVersionsPerTrigger bounds each micro-batch's commit range
    (admission control for backlog recovery): a 5-commit backlog
    drains 2 versions per trigger — the initial snapshot itself
    respects the cap — with exactly-once totals across restarts."""
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.delta_source import read_delta_stream

    src, out, ckpt = str(tmp_path / "t"), str(tmp_path / "o"), str(tmp_path / "c")
    dl = DeltaLogTable(spark, src)
    for i in range(5):
        dl.write(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id"), mode="append"
        )
    seen = []
    for _ in range(4):
        run_available_now(
            read_delta_stream(spark, src, max_versions_per_trigger=2), out, ckpt
        )
        seen.append(spark.read.parquet(out).count())
    assert seen == [20, 40, 50, 50], seen
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(50))


def test_iceberg_stream_source_semantics(spark, tmp_path):
    """Initial snapshot reconciles position deletes; DML snapshots
    abort without ignoreChanges and skip with it; equality deletes
    reconcile into the initial snapshot (r12 — previously a
    refusal)."""
    import os

    import pytest as _pytest

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.iceberg_source import read_iceberg_stream

    t = IcebergTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 100).selectExpr("id", "id * 2 AS v"))
    t.delete("id < 10")  # BEFORE the stream: part of the initial snapshot
    out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "c1")
    run_available_now(read_iceberg_stream(spark, str(tmp_path / "t")), out1, ck1)
    got = spark.read.parquet(out1)
    assert got.count() == 90 and got.filter("id < 10").count() == 0

    # post-stream DML aborts without ignoreChanges
    t.delete("id >= 95")
    with _pytest.raises(Exception, match="ignoreChanges"):
        run_available_now(read_iceberg_stream(spark, str(tmp_path / "t")), out1, ck1)
    # with ignoreChanges the delete snapshot is skipped, appends flow.
    # (The aborted run already WAL-logged the delete snapshot's offset
    # range, and Python sources run ONE batch per availableNow — so the
    # first recovery run drains that empty range, the next ingests the
    # append.)
    t.append(spark.createDataFrame([(1000, 1)], "id long, v long"))
    for _ in range(2):
        run_available_now(
            read_iceberg_stream(spark, str(tmp_path / "t"), ignore_changes=True),
            out1,
            ck1,
        )
    assert spark.read.parquet(out1).count() == 91

    # equality deletes reconcile into the initial snapshot (r12):
    # the masked keys never appear — no refusal, no ghost rows
    _ = _pytest  # (the refusal assertions above keep the import busy)
    t2 = IcebergTable(spark, str(tmp_path / "t2"))
    t2.append(spark.range(0, 10).selectExpr("id", "id AS v"))
    t2.delete_eq(spark.range(0, 3).selectExpr("id"), keys=["id"])
    run_available_now(
        read_iceberg_stream(spark, str(tmp_path / "t2")),
        str(tmp_path / "o2"),
        str(tmp_path / "c2"),
    )
    got2 = spark.read.parquet(str(tmp_path / "o2"))
    assert got2.count() == 7 and got2.filter("id < 3").count() == 0


def test_iceberg_stream_sink_idempotence(spark, tmp_path):
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.streaming.autoloader import IcebergStreamSink

    t = IcebergTable(spark, str(tmp_path / "t"))
    sink = IcebergStreamSink(t, app_id="test-app")
    sink.write_batch(spark.range(0, 5).selectExpr("id"), 0)
    sink.write_batch(spark.range(5, 9).selectExpr("id"), 1)
    assert t.read().count() == 9
    assert t.txn_version("test-app") == 1
    sink.write_batch(spark.range(0, 5).selectExpr("id"), 1)  # replay
    assert t.read().count() == 9
    sink.write_batch(spark.range(9, 10).selectExpr("id"), 2)
    assert t.read().count() == 10
    assert t.txn_version("other-app") == -1


def test_stream_heavy_hitters_bounds(spark):
    """Space-saving guarantees on the events feed: est >= true,
    est - err <= true, and the per-type top-1 agrees with exact
    counts (its true count is far above the n/m error ceiling)."""
    from ent_fins_lakehouse_spark.plans.streaming_queries import (
        q228_stream_heavy_hitters,
    )
    from ent_fins_lakehouse_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    out = q228_stream_heavy_hitters(spark, SF_SMOKE).collect()
    assert out, "no heavy-hitter emissions"
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tops = {}
    for r in out:
        true = exact.get((r["event_type"], r["user_id"]), 0)
        assert r["est"] >= true, f"underestimate: {r} vs {true}"
        assert r["est"] - r["err"] <= true, f"bound violated: {r} vs {true}"
        if r["rank"] == 0:
            tops[r["event_type"]] = r["user_id"]
    for et, uid in tops.items():
        best = max(
            (n, -u) for (t, u), n in exact.items() if t == et
        )
        assert exact[(et, uid)] == best[0], f"top-1 mismatch for {et}"


def test_stream_heavy_hitters_planted_skew(spark, tmp_path):
    """A key with true count > n/m MUST be present (the space-saving
    admission guarantee), exercised on a deliberately skewed stream
    split across microbatches."""
    import json

    from ent_fins_lakehouse_spark.streaming.stateful import (
        HH_CAPACITY,
        heavy_hitters_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    # 3 waves; user 7 dominates (600 of ~1400 events), 200 distinct
    # tail users churn the 32-entry summary
    rows_per_wave = []
    for wave in range(3):
        rows = [{"event_type": "click", "user_id": 7}] * 200
        rows += [
            {"event_type": "click", "user_id": 100 + ((wave * 97 + i) % 200)}
            for i in range(270)
        ]
        rows_per_wave.append(rows)
    for i, rows in enumerate(rows_per_wave):
        with open(src / f"wave{i}.json", "w") as fh:
            fh.write("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("event_type STRING, user_id LONG")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    target, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        heavy_hitters_stream(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda bdf, _b: bdf.write.mode("append").parquet(target))
        .start()
    )
    q.awaitTermination()
    out = spark.read.schema(
        "event_type STRING, rank INT, user_id LONG, est LONG, err LONG, n_seen LONG"
    ).parquet(target)
    final = (
        out.orderBy(F.desc("n_seen"), "rank")
        .filter(F.col("rank") == 0)
        .first()
    )
    n_total = sum(len(r) for r in rows_per_wave)
    assert 600 > n_total / HH_CAPACITY  # the guarantee applies
    assert final["user_id"] == 7 and final["est"] >= 600
    assert final["est"] - final["err"] <= 600


def test_stream_state_ttl_finalization(spark):
    """Every user finalizes exactly once with totals equal to the
    batch aggregate; the state store is empty at stop (all sessions
    closed)."""
    from ent_fins_lakehouse_spark.plans.streaming_queries import (
        q233_stream_state_ttl,
    )
    from ent_fins_lakehouse_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    out = q233_stream_state_ttl(spark, SF_SMOKE).collect()
    exact = {
        r["user_id"]: (r["n"], r["tot"])
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("user_id") < 60)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tot"))
        .collect()
    }
    assert len(out) == len(exact)  # exactly once per user
    for r in out:
        n, tot = exact[r["user_id"]]
        assert r["n_events"] == n
        assert abs(r["total_value"] - tot) < 1e-3


def test_delta_stream_from_mapped_tables(spark, tmp_path):
    """Streaming from column-mapped Delta tables: name mode resolves
    physical column names, id mode resolves parquet FIELD IDS, and a
    rename mid-stream (metadata-only) keeps later batches correct."""
    from tests.test_lakehouse import _id_mapped_table, _name_mapped_table

    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.delta_source import read_delta_stream

    # name mode
    t = _name_mapped_table(spark, tmp_path, "nmstream")
    out, ckpt = str(tmp_path / "nm_out"), str(tmp_path / "nm_ckpt")
    run_available_now(read_delta_stream(spark, t.path), out, ckpt)
    got = sorted(
        (r["renamed_id"], r["v"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [(i, f"r{i}") for i in range(6)]

    # id mode — physical names are arbitrary, ids resolve
    t2 = _id_mapped_table(spark, tmp_path, "idstream")
    out2, ckpt2 = str(tmp_path / "id_out"), str(tmp_path / "id_ckpt")
    run_available_now(read_delta_stream(spark, t2.path), out2, ckpt2)
    got2 = sorted(
        (r["renamed_id"], r["v"]) for r in spark.read.parquet(out2).collect()
    )
    assert got2 == [(i, f"r{i}") for i in range(6)]

    # second drain through the SAME checkpoint after an append: only
    # the new rows, still resolved through the mapping
    t2.write(
        spark.createDataFrame([(100, "x")], "renamed_id BIGINT, v STRING"),
        mode="append",
    )
    run_available_now(read_delta_stream(spark, t2.path), out2, ckpt2)
    got3 = sorted(r["renamed_id"] for r in spark.read.parquet(out2).collect())
    assert got3 == [0, 1, 2, 3, 4, 5, 100]


def test_delta_stream_starting_version(spark, tmp_path):
    """startingVersion skips the initial snapshot: only commits >= the
    given version flow; "latest" resolves at stream construction so a
    fresh stream sees nothing until a NEW commit lands; a DELETE before
    the starting version never aborts the stream (it is simply outside
    the window)."""
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.delta_source import read_delta_stream

    src = str(tmp_path / "t")
    dl = DeltaLogTable(spark, src)
    dl.write(spark.createDataFrame([(1,), (2,)], "id INT"), mode="append")  # v0
    dl.write(spark.createDataFrame([(3,)], "id INT"), mode="append")  # v1
    dl.delete("id = 1")  # v2 (DV delete — would abort a window covering it)
    dl.write(spark.createDataFrame([(4,)], "id INT"), mode="append")  # v3

    # from v3: only the last append
    out, ckpt = str(tmp_path / "o1"), str(tmp_path / "c1")
    run_available_now(
        read_delta_stream(spark, src, starting_version=3), out, ckpt
    )
    assert [r["id"] for r in spark.read.parquet(out).collect()] == [4]

    # from v1: the v1 append + v3 append; the v2 DV delete aborts
    # without ignoreChanges (it IS inside this window)
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    import pytest as _pytest

    with _pytest.raises(Exception, match="deletion vector|ignoreChanges"):
        run_available_now(
            read_delta_stream(spark, src, starting_version=1), out2, ckpt2
        )

    # "latest": nothing until a post-construction commit arrives
    out3, ckpt3 = str(tmp_path / "o3"), str(tmp_path / "c3")
    run_available_now(
        read_delta_stream(spark, src, starting_version="latest"), out3, ckpt3
    )
    import os as _os

    n3 = (
        spark.read.parquet(out3).count()
        if any(f.endswith(".parquet") for f in _os.listdir(out3))
        else 0
    )
    assert n3 == 0
    dl.write(spark.createDataFrame([(5,)], "id INT"), mode="append")  # v4
    run_available_now(
        read_delta_stream(spark, src, starting_version="latest"), out3, ckpt3
    )
    assert [r["id"] for r in spark.read.parquet(out3).collect()] == [5]


def test_matview_streaming_attach_with_starting_version(spark, tmp_path):
    """The production streaming-MV shape: create the view over a
    POPULATED base (full compute at version v), then attach the
    change-feed stream at startingVersion=v+1 — no replay of history
    the view already aggregates, exactly-once through the batch-id
    gate."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.matview import MaterializedAggView
    from ent_fins_lakehouse_spark.streaming.delta_source import read_delta_stream

    src = str(tmp_path / "base")
    dl = DeltaLogTable(spark, src)
    dl.write(
        spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g"),
            (F.col("id") * 2.0).alias("v"),
        ),
        mode="append",
    )
    dl.set_property("delta.enableChangeDataFeed", "true")
    mv = MaterializedAggView(spark, dl, str(tmp_path / "view"))
    created = mv.create(["g"], ["v"])
    assert created["groups"] == 5
    attach_from = created["base_version"] + 1

    # post-create DML the stream must deliver (and nothing earlier)
    dl.delete("g = 2")
    dl.write(
        spark.range(50).select(
            (F.col("id") + 9000).alias("k"), F.lit(1).cast("long").alias("g"),
            F.lit(3.5).alias("v"),
        ),
        mode="append",
    )

    ckpt = str(tmp_path / "ckpt")
    q = (
        read_delta_stream(
            spark, src, read_change_feed=True, starting_version=attach_from
        )
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(mv.streaming_sink())
        .start()
    )
    q.awaitTermination()

    got = {(r["g"], r["n_rows"], r["sum_v"]) for r in mv.read().collect()}
    want = {
        (r["g"], r["n_rows"], r["sum_v"])
        for r in mv._aggregate(dl.read(), ["g"], ["v"]).collect()
    }
    assert got == want
    assert not any(g == 2 for g, _, _ in got)


def test_iceberg_change_feed_stream(spark, tmp_path):
    """readChangeFeed=true: appends stream as _change_type='insert',
    MoR position deletes stream the masked rows as 'delete' (exactly
    those rows, stamped with the delete snapshot), and CoW rewrites
    refuse — the streaming twin of IcebergTable.read_changes."""
    import pytest as _pytest

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.iceberg_source import read_iceberg_stream

    t = IcebergTable(spark, str(tmp_path / "cdf"))
    t.append(spark.range(0, 1).selectExpr("id", "id AS v").limit(0).coalesce(1))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    run_available_now(
        read_iceberg_stream(spark, t.path, read_change_feed=True), out, ck
    )  # initial empty snapshot

    t.append(spark.range(0, 20).selectExpr("id", "id AS v").coalesce(1))
    t.delete("id % 4 = 1", mode="mor")
    run_available_now(
        read_iceberg_stream(spark, t.path, read_change_feed=True), out, ck
    )
    feed = spark.read.parquet(out)
    ins = {r.id for r in feed.filter("_change_type = 'insert'").collect()}
    dels = {r.id for r in feed.filter("_change_type = 'delete'").collect()}
    assert ins == set(range(20))
    assert dels == {i for i in range(20) if i % 4 == 1}
    # delete rows are stamped with the DELETE snapshot, after the insert's
    snaps = feed.groupBy("_change_type").agg(
        F.max("_commit_snapshot").alias("s")
    ).collect()
    by_type = {r["_change_type"]: r["s"] for r in snaps}
    assert by_type["delete"] > by_type["insert"]

    # CoW rewrites refuse in change-feed mode (batch read_changes' rule)
    t.delete("id = 0", mode="cow")
    with _pytest.raises(Exception, match="copy-on-write"):
        run_available_now(
            read_iceberg_stream(spark, t.path, read_change_feed=True), out, ck
        )


def test_iceberg_change_feed_streams_dv_deltas(spark, tmp_path):
    """v3 deletion vectors through the change-feed stream: each DV
    snapshot emits only its bitmap DELTA (a second delete covering
    already-deleted rows re-emits nothing for them), and the initial
    snapshot of a fresh stream applies DV masks to the reconciled
    state."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.iceberg_source import read_iceberg_stream

    t = IcebergTable(spark, str(tmp_path / "dv"))
    t.append(spark.range(0, 1).selectExpr("id", "id AS v").limit(0).coalesce(1))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    run_available_now(
        read_iceberg_stream(spark, t.path, read_change_feed=True), out, ck
    )

    t.append(spark.range(0, 24).selectExpr("id", "id AS v").coalesce(1))
    t.delete("id % 4 = 1", mode="dv")
    t.delete("id % 4 = 1 OR id % 4 = 2", mode="dv")  # delta = %4==2 only
    run_available_now(
        read_iceberg_stream(spark, t.path, read_change_feed=True), out, ck
    )
    feed = spark.read.parquet(out)
    dels = feed.filter("_change_type = 'delete'").groupBy("_commit_snapshot").agg(
        F.collect_set("id").alias("ids")
    ).collect()
    by_snap = {r["_commit_snapshot"]: sorted(r["ids"]) for r in dels}
    assert sorted(by_snap) == [3, 4]
    assert by_snap[3] == [i for i in range(24) if i % 4 == 1]
    assert by_snap[4] == [i for i in range(24) if i % 4 == 2], "bitmap delta leaked"
    ins = {r.id for r in feed.filter("_change_type = 'insert'").collect()}
    assert ins == set(range(24))

    # fresh stream: initial snapshot reconciles the DV masks
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    run_available_now(read_iceberg_stream(spark, t.path), out2, ck2)
    live = {r.id for r in spark.read.parquet(out2).collect()}
    assert live == {i for i in range(24) if i % 4 not in (1, 2)}


def test_iceberg_stream_rate_limiting(spark, tmp_path):
    """maxSnapshotsPerTrigger (the Delta maxVersionsPerTrigger twin at
    snapshot-index granularity): a 4-snapshot backlog drains two
    snapshots per availableNow run instead of one unbounded batch."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.iceberg_source import read_iceberg_stream

    t = IcebergTable(spark, str(tmp_path / "rl"))
    t.append(spark.range(0, 1).selectExpr("id", "id AS v").limit(0).coalesce(1))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # initial batch: the (empty) reconciled snapshot
    run_available_now(
        read_iceberg_stream(spark, t.path, max_snapshots_per_trigger=2), out, ck
    )
    for i in range(4):
        t.append(
            spark.range(i * 10, i * 10 + 10).selectExpr("id", "id AS v").coalesce(1)
        )
    seen = []
    for _ in range(4):
        run_available_now(
            read_iceberg_stream(spark, t.path, max_snapshots_per_trigger=2), out, ck
        )
        seen.append(spark.read.parquet(out).count())
    # exactly two snapshots per availableNow run until the backlog
    # drains (the WAL-replay realignment in partitions() gives a fresh
    # reader its true cursor before the stride poll)
    assert seen == [20, 40, 40, 40], seen
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(range(40))


def test_iceberg_streaming_mv_full_arc(spark, tmp_path):
    """The full q366 arc (moved out of the bench path, VERDICT r10
    item 5): three separate availableNow runs over ONE checkpoint —
    empty initial snapshot, a seed+MoR-delete+enrich feed window, and
    a post-stream commit — plus stale-batch replay idempotence. The
    bench-path q366 keeps the single-drain variant; this test owns the
    checkpoint-continuation and exactly-once assertions."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.matview import MaterializedAggView
    from ent_fins_lakehouse_spark.streaming.iceberg_source import read_iceberg_stream

    sf_dir = "/root/testdata/sf0.001"
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", (F.col("o_custkey") % 45).alias("g"), "o_totalprice")
    )
    base = IcebergTable(spark, str(tmp_path / "base"))
    base.append(orders.limit(0).coalesce(1))  # schema-only snapshot
    mv = MaterializedAggView(spark, base, str(tmp_path / "view"))
    assert mv.create(["g"], ["o_totalprice"])["groups"] == 0

    ckpt = str(tmp_path / "ckpt")
    sink = mv.streaming_sink()

    def run() -> None:
        q = (
            read_iceberg_stream(spark, base.path, read_change_feed=True)
            .writeStream.trigger(availableNow=True)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()

    run()  # initial snapshot of the empty base: no rows, view unchanged
    assert mv.read().count() == 0

    # three commits arrive THROUGH the feed: seed, MoR delete, enrich
    base.append(orders.coalesce(4))
    base.delete("g = 7", mode="mor")
    first_sid = base.snapshots()[0]["snapshot-id"]
    base.append(
        orders.filter(F.col("g") == 13).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "g",
            (F.col("o_totalprice") + 700).alias("o_totalprice"),
        ).coalesce(1)
    )
    run()
    mid = {tuple(r) for r in mv.read().collect()}
    assert not any(r[0] == 7 for r in mid), "deleted group leaked into the view"

    # a replayed micro-batch must be a no-op (idempotent sink)
    replay = base.read_changes(first_sid)
    sink(replay, 0)  # stale batch id: already applied
    assert {tuple(r) for r in mv.read().collect()} == mid, "replay double-applied"

    # post-stream commit flows through the SAME checkpoint
    base.append(
        orders.filter(F.col("g") == 21).select(
            (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
            "g",
            (F.col("o_totalprice") + 900).alias("o_totalprice"),
        ).coalesce(1)
    )
    run()

    got = mv.read()
    want = mv._aggregate(base.read(), ["g"], ["o_totalprice"])
    diff = got.exceptAll(want).unionByName(want.exceptAll(got)).count()
    assert diff == 0, f"streaming view diverged from recompute ({diff} rows)"


def test_iceberg_eq_delete_stream_exactly_once_and_replay(spark, tmp_path):
    """q383's contract pinned: equality-delete snapshots stream the
    CDC pair exactly once — a third availableNow run through the same
    checkpoint adds NOTHING — and the accumulated feed replays to the
    table's final state row-for-row."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.iceberg_source import (
        read_iceberg_stream,
    )

    rows = [(k, float(k) * 10) for k in range(1, 21)]
    base = spark.createDataFrame(rows, "k long, v double")
    t = IcebergTable(spark, str(tmp_path / "t"))
    t.append(base.coalesce(2))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(
        read_iceberg_stream(spark, t.path, read_change_feed=True), out, ckpt
    )
    # upsert: keys 5..8 new values, key 100 brand new; delete keys 1..3
    src = spark.createDataFrame(
        [(k, float(k) * 100) for k in (5, 6, 7, 8)] + [(100, 1.0)],
        "k long, v double",
    )
    t.upsert_eq(src, ["k"])
    t.delete_eq(spark.createDataFrame([(1,), (2,), (3,)], "k long"), ["k"])
    run_available_now(
        read_iceberg_stream(spark, t.path, read_change_feed=True), out, ckpt
    )
    feed = spark.read.parquet(out)
    n2 = feed.count()
    # upsert pair: 4 old rows deleted + 5 inserted; delete: 3 rows
    assert feed.filter("_change_type = 'delete'").count() == 7
    assert feed.filter("_change_type = 'insert'").count() == 20 + 5
    # exactly-once: a replay drain adds nothing
    run_available_now(
        read_iceberg_stream(spark, t.path, read_change_feed=True), out, ckpt
    )
    assert spark.read.parquet(out).count() == n2
    # feed replay reconstructs the final state: last event per key
    # wins, and within one snapshot the insert (the upsert's new row)
    # outranks the delete of the old row — postimage over preimage
    from pyspark.sql import Window as W

    pri = F.when(F.col("_change_type") == "insert", 1).otherwise(0)
    w = W.partitionBy("k").orderBy(F.desc("_commit_snapshot"), F.desc(pri))
    final = (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1 AND _change_type = 'insert'")
        .select("k", "v")
    )
    want = t.read().select("k", "v")
    assert final.exceptAll(want).unionByName(want.exceptAll(final)).count() == 0


def test_iceberg_stream_initial_snapshot_applies_eq_deletes(spark, tmp_path):
    """A stream STARTED on a table already carrying equality deletes
    reconciles them into the initial snapshot (no refusal, no ghost
    rows), honoring the sequence rule: an upsert's own data file
    survives its same-snapshot delete."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.streaming.autoloader import run_available_now
    from ent_fins_lakehouse_spark.streaming.iceberg_source import (
        read_iceberg_stream,
    )

    base = spark.createDataFrame(
        [(k, float(k)) for k in range(1, 11)], "k long, v double"
    )
    t = IcebergTable(spark, str(tmp_path / "t"))
    t.append(base.coalesce(1))
    t.upsert_eq(
        spark.createDataFrame([(5, 500.0), (42, 42.0)], "k long, v double"),
        ["k"],
    )
    t.delete_eq(spark.createDataFrame([(9,)], "k long"), ["k"])
    out = str(tmp_path / "out")
    run_available_now(
        read_iceberg_stream(spark, t.path), out, str(tmp_path / "ckpt")
    )
    got = spark.read.parquet(out).select("k", "v")
    want = t.read().select("k", "v")
    assert got.exceptAll(want).unionByName(want.exceptAll(got)).count() == 0
    vals = {r["k"]: r["v"] for r in got.collect()}
    assert vals[5] == 500.0 and vals[42] == 42.0 and 9 not in vals


def test_eq_delete_stream_feeds_streaming_agg_mv(spark, tmp_path):
    """The q383 headline composed end-to-end: a Flink-CDC-shaped
    Iceberg table (upsert_eq / delete_eq — equality deletes, never
    compacted) continuously maintains a MaterializedAggView through
    its CDF STREAM. The view lands bit-identical to a recompute of
    the final base state, and a replayed drain is a no-op."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.matview import MaterializedAggView
    from ent_fins_lakehouse_spark.streaming.iceberg_source import (
        read_iceberg_stream,
    )

    base_rows = [(k, k % 3, float(k)) for k in range(1, 31)]
    t = IcebergTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(base_rows, "k long, g long, v double"))
    mv = MaterializedAggView(spark, t, str(tmp_path / "v"))
    # create at the CURRENT snapshot; the stream will deliver ONLY the
    # post-create windows (startingSnapshot semantics via checkpoint:
    # drain once now so the initial snapshot is consumed pre-DML)
    mv.create(["g"], ["v"])

    def apply(bdf, batch_id):
        d = mv._load()
        if int(batch_id) <= int(d.get("last_batch_id", -1)):
            return
        if int(batch_id) == 0:
            # batch 0 is the initial reconciled snapshot — already in
            # the view via create(); skip it, record the id
            mv._save({**mv._load(), "last_batch_id": 0})
            return
        mv.apply_changes(bdf)
        mv._save({**mv._load(), "last_batch_id": int(batch_id)})

    def drain():
        q = (
            read_iceberg_stream(spark, t.path, read_change_feed=True)
            .writeStream.trigger(availableNow=True)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(apply)
            .start()
        )
        q.awaitTermination()

    drain()  # consumes the initial snapshot (skipped as batch 0)
    # CDC wave: upsert moves values, delete removes a group's rows
    t.upsert_eq(
        spark.createDataFrame(
            [(5, 5 % 3, 500.0), (6, 6 % 3, 600.0), (100, 1, 42.0)],
            "k long, g long, v double",
        ),
        ["k"],
    )
    t.delete_eq(spark.createDataFrame([(3,), (9,)], "k long"), ["k"])
    drain()

    got = mv.read().select("g", "n_rows", "sum_v")
    want = mv._aggregate(t.read(), ["g"], ["v"]).select("g", "n_rows", "sum_v")
    assert got.exceptAll(want).unionByName(want.exceptAll(got)).count() == 0
    # replayed drain: no state change
    before = {tuple(r) for r in got.collect()}
    drain()
    after = {tuple(r) for r in mv.read().select("g", "n_rows", "sum_v").collect()}
    assert after == before
