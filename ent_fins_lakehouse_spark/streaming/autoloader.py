"""Incremental file ingestion + streaming sinks (SURVEY.md §2.9).

Open-source re-expression of the reference's Auto Loader pipeline
(`/root/reference/Instructor/Auto Loader demo.py:69-84`): the
``cloudFiles`` format becomes Spark's file streaming source (new-file
discovery tracked in the checkpoint WAL → exactly-once, idempotent
re-run: "no new files → does nothing", demo at `:123-131`), and
``trigger(once=True)`` becomes ``trigger(availableNow=True)``.

``LakeStreamSink`` extends the reference's Delta streaming sink (S9)
to our LakeTable: ``foreachBatch`` appends with the streaming batch id
recorded in the commit metrics, so a replayed microbatch (checkpoint
rollback, driver retry) is detected and skipped — the same
idempotent-commit contract Delta's streaming sink implements via
txnAppId/txnVersion.

Scale note: the file source lists the input directory each trigger;
at cloud scale you would partition the landing zone by arrival hour so
the listing stays bounded — the checkpoint/exactly-once mechanics are
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable


def ingest_file_stream(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """S6: discover & ingest new files exactly-once (incl. existing
    files, like cloudFiles.includeExistingFiles).

    ``mode``: JSON parse handling — PERMISSIVE surfaces malformed
    records as all-null rows (Spark default); pass DROPMALFORMED to
    silently skip them, or FAILFAST to abort the batch.
    """
    reader = spark.readStream.format(fmt).schema(schema).option("mode", mode)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(src_dir)


def run_available_now(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    output_mode: str = "append",
) -> StreamingQuery:
    """S9: checkpointed one-shot streaming write
    (`Auto Loader demo.py:77-84`, trigger(once) → availableNow)."""
    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .format(fmt)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start(target_dir)
    )
    q.awaitTermination()
    return q


class LakeStreamSink:
    """Exactly-once streaming sink into a LakeTable via foreachBatch."""

    def __init__(self, table: LakeTable):
        self.table = table

    def _committed_batches(self) -> set[int]:
        return {
            int(c.metrics["streaming_batch_id"])
            for c in self.table._read_commits()
            if "streaming_batch_id" in c.metrics
        }

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed_batches():
            return  # replayed microbatch — already durable, skip
        if not self.table.exists():
            rel = self.table._write_data_dir(df)
            self.table._commit("streaming_append", [rel], [], df.schema, {"streaming_batch_id": batch_id})
            return
        _, schema = self.table._snapshot()
        df = self.table._check_schema(df, schema, merge_schema=False)
        rel = self.table._write_data_dir(df)
        self.table._commit("streaming_append", [rel], [], schema, {"streaming_batch_id": batch_id})

    def start(self, stream_df: DataFrame, checkpoint_dir: str, available_now: bool = True) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self.write_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = writer.start()
        return q
