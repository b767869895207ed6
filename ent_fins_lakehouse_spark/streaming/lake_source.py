"""LakeTable as a Structured-Streaming SOURCE (S5 — the Delta
streaming scan, `Instructor/01-Fraud-Delta.py:175`):

    spark.dataSource.register(make_lake_stream_source())
    spark.readStream.format("lake_stream").option("path", p).load()

Built on Spark 4's Python Data Source API. Offsets are commit-log
versions: each microbatch covers the data directories added by commits
in (start_version, end_version] — exactly-once because the commit log
is append-only and versions are dense integers. Appends stream
through; commits that REMOVE files (overwrite/delete/merge) abort the
stream unless ``ignoreChanges=true`` (Delta's contract), since
replaying a rewrite would double-count.

read() yields pyarrow RecordBatches (the Arrow fast path — no
row-at-a-time Python). One InputPartition per added data directory, so
batch parallelism matches commit granularity; inside a directory the
parquet part files are streamed batch-by-batch with bounded memory.

The classes are built inside a factory (closure scope) so cloudpickle
ships them BY VALUE to the data-source worker processes — those
processes don't have this package on sys.path.
"""

from __future__ import annotations

from ent_fins_lakehouse_spark.sources.lakehouse import LOG_DIR


def make_lake_stream_source():
    """Build the DataSource class (self-contained, pickled by value)."""
    import json
    import os

    from pyspark.sql import types as T
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    log_dir = LOG_DIR  # captured constant, not a module reference

    def read_commits(table_path: str) -> list[dict]:
        log = os.path.join(table_path, log_dir)
        if not os.path.isdir(log):
            return []
        out = []
        for f in sorted(os.listdir(log)):
            if f.endswith(".json"):
                with open(os.path.join(log, f)) as fh:
                    out.append(json.loads(fh.read()))
        return out

    class DirPartition(InputPartition):
        def __init__(self, abs_dir: str):
            self.abs_dir = abs_dir

    class LakeStreamReader(DataSourceStreamReader):
        def __init__(self, table_path: str, ignore_changes: bool):
            self.table_path = table_path
            self.ignore_changes = ignore_changes

        def initialOffset(self) -> dict:
            return {"version": -1}

        def latestOffset(self) -> dict:
            commits = read_commits(self.table_path)
            return {"version": commits[-1]["version"] if commits else -1}

        def partitions(self, start: dict, end: dict):
            lo, hi = start["version"], end["version"]
            parts = []
            for c in read_commits(self.table_path):
                if not (lo < c["version"] <= hi):
                    continue
                if c["remove"] and not self.ignore_changes:
                    raise RuntimeError(
                        f"commit v{c['version']} ({c['operation']}) rewrites "
                        "data; streaming from a table with updates/deletes "
                        "requires option ignoreChanges=true"
                    )
                for rel in c["add"]:
                    parts.append(DirPartition(os.path.join(self.table_path, rel)))
            # a batch with no new data still needs a valid (empty) plan
            return parts or [DirPartition("")]

        def read(self, partition):
            if not partition.abs_dir or not os.path.isdir(partition.abs_dir):
                return iter(())
            import pyarrow.parquet as pq

            def gen():
                for f in sorted(os.listdir(partition.abs_dir)):
                    if f.endswith(".parquet"):
                        pf = pq.ParquetFile(os.path.join(partition.abs_dir, f))
                        yield from pf.iter_batches()

            return gen()

        def commit(self, end: dict) -> None:
            pass  # offsets are durable in the query checkpoint

    class LakeStreamDataSource(DataSource):
        """``format("lake_stream")`` — options: path, ignoreChanges."""

        @classmethod
        def name(cls) -> str:
            return "lake_stream"

        def schema(self):
            commits = read_commits(self.options["path"])
            if not commits:
                raise ValueError(f"not a lake table: {self.options['path']}")
            schema_json = None
            for c in commits:
                if c.get("schema_json"):
                    schema_json = c["schema_json"]
            return T.StructType.fromJson(json.loads(schema_json))

        def streamReader(self, schema):
            return LakeStreamReader(
                self.options["path"],
                self.options.get("ignorechanges", "false").lower() == "true",
            )

    return LakeStreamDataSource


def register(spark) -> None:
    spark.dataSource.register(make_lake_stream_source())


def read_lake_stream(spark, path: str, ignore_changes: bool = False):
    """S5: continuously read a LakeTable as it is appended."""
    register(spark)
    return (
        spark.readStream.format("lake_stream")
        .option("path", path)
        .option("ignoreChanges", str(ignore_changes).lower())
        .load()
    )
