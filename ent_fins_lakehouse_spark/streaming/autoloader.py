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

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


class AutoLoader:
    """``cloudFiles`` stand-in with schema inference, evolution and a
    rescued-data column (`/root/reference/Instructor/Auto Loader
    demo.py:69-76`: ``cloudFiles.schemaLocation``, add-new-columns
    evolution, ``_rescued_data``).

    How it maps to Spark primitives, and why it scales:

    - The STREAM reads raw text lines (schema-free, so the checkpoint's
      exactly-once file tracking survives schema changes); the declared
      schema is applied as a ``from_json`` PROJECTION. Schema evolution
      is therefore just a wider projection over the same source — no
      checkpoint reset, no re-ingest.
    - The inferred schema is versioned as JSON under ``schema_location``
      (cloudFiles' ``_schemas/`` directory). On each run the inferred
      schema of the landing zone is merged into the stored one: new
      columns are APPENDED (addNewColumns), type conflicts widen along
      :meth:`LakeTable._numeric_lub`'s lattice (the q137 rules);
      unwidenable conflicts keep the stored type and the offending
      values land in ``_rescued_data`` instead of failing the stream.
    - ``_rescued_data`` is a JSON-object column capturing (a) keys not
      in the declared schema, (b) declared keys whose value failed the
      typed parse, (c) wholly malformed lines (under
      ``_corrupt_record``); null when nothing was rescued. Computed
      with JVM map functions — no Python in the per-record path.

    Inference cost note: inference scans the landing zone with
    ``spark.read.json`` (cloudFiles samples instead); at cloud scale,
    partition the landing zone by arrival hour and point inference at
    the newest partition.
    """

    def __init__(
        self,
        spark: SparkSession,
        src_dir: str,
        schema_location: str,
        schema_evolution: bool = True,
    ):
        self.spark = spark
        self.src_dir = src_dir
        self.schema_dir = os.path.join(schema_location, "_schemas")
        self.schema_evolution = schema_evolution

    # -------------------------------------------------------- schema store

    def _stored_versions(self) -> list[str]:
        if not os.path.isdir(self.schema_dir):
            return []
        return sorted(
            f for f in os.listdir(self.schema_dir) if os.path.splitext(f)[0].isdigit()
        )

    def load_schema(self) -> T.StructType | None:
        vs = self._stored_versions()
        if not vs:
            return None
        with open(os.path.join(self.schema_dir, vs[-1]), encoding="utf-8") as fh:
            return T.StructType.fromJson(json.load(fh))

    def _store_schema(self, schema: T.StructType) -> None:
        os.makedirs(self.schema_dir, exist_ok=True)
        v = len(self._stored_versions())
        with open(os.path.join(self.schema_dir, f"{v}.json"), "w", encoding="utf-8") as fh:
            json.dump(schema.jsonValue(), fh)

    def _infer(self) -> T.StructType:
        return self.spark.read.json(self.src_dir).schema

    def _merge(self, stored: T.StructType, inferred: T.StructType) -> T.StructType:
        out = list(stored.fields)
        have = {f.name: i for i, f in enumerate(out)}
        for f in inferred.fields:
            if f.name == "_corrupt_record":
                continue
            i = have.get(f.name)
            if i is None:
                out.append(T.StructField(f.name, f.dataType, True))
                have[f.name] = len(out) - 1
            elif out[i].dataType != f.dataType:
                lub = LakeTable._numeric_lub(out[i].dataType, f.dataType)
                if lub is not None:
                    out[i] = T.StructField(f.name, lub, True)
                # unwidenable conflict: keep the stored type; failing
                # values are rescued row-by-row, not a stream failure
        return T.StructType(out)

    def resolve_schema(self) -> T.StructType:
        stored = self.load_schema()
        if stored is None:
            inferred = T.StructType(
                [f for f in self._infer().fields if f.name != "_corrupt_record"]
            )
            self._store_schema(inferred)
            return inferred
        if not self.schema_evolution:
            return stored
        merged = self._merge(stored, self._infer())
        if merged != stored:
            self._store_schema(merged)
        return merged

    # ------------------------------------------------------------- stream

    @staticmethod
    def with_rescued_data(raw: DataFrame, schema: T.StructType) -> DataFrame:
        """Typed projection + ``_rescued_data`` over a text-line stream
        (flat JSON objects; nested values ride as raw JSON strings)."""
        declared = [f.name for f in schema.fields]
        parsed = F.from_json("value", schema)
        allmap = F.from_json("value", "map<string,string>")
        unknown = F.map_filter(
            allmap, lambda k, _v: ~k.isin(*declared) if declared else F.lit(True)
        )
        failed = F.map_from_entries(
            F.filter(
                F.array(
                    *[
                        F.when(
                            parsed[f.name].isNull()
                            & F.element_at(allmap, f.name).isNotNull(),
                            F.struct(
                                F.lit(f.name).alias("key"),
                                F.element_at(allmap, f.name).alias("value"),
                            ),
                        )
                        for f in schema.fields
                    ]
                ),
                lambda e: e.isNotNull(),
            )
        )
        rescue = F.map_concat(unknown, failed)
        rescued_col = (
            F.when(allmap.isNull(), F.to_json(F.create_map(F.lit("_corrupt_record"), F.col("value"))))
            .when(F.size(F.map_keys(rescue)) > 0, F.to_json(rescue))
            .otherwise(F.lit(None).cast("string"))
        )
        return raw.select(
            *[parsed[f.name].alias(f.name) for f in schema.fields],
            rescued_col.alias("_rescued_data"),
        )

    def stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        schema = self.resolve_schema()
        reader = self.spark.readStream.format("text")
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return self.with_rescued_data(reader.load(self.src_dir), schema)


class LakeStreamSink:
    """Exactly-once streaming sink into a LakeTable via foreachBatch.

    ``merge_schema=True`` lets microbatches evolve the table along the
    same widening lattice as batch writes — the sink half of Auto
    Loader schema evolution (a widened stream schema would otherwise
    fail enforcement mid-stream)."""

    def __init__(self, table: LakeTable, merge_schema: bool = False):
        self.table = table
        self.merge_schema = merge_schema

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
        df = self.table._check_schema(df, schema, merge_schema=self.merge_schema)
        rel = self.table._write_data_dir(df)
        self.table._commit(
            "streaming_append", [rel], [], df.schema, {"streaming_batch_id": batch_id}
        )

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

class DeltaStreamSink:
    """Exactly-once streaming sink into a PUBLIC-format Delta table
    (:class:`DeltaLogTable`) via ``foreachBatch`` + the spec's ``txn``
    action ('Transaction Identifiers') — the mechanism delta-spark's
    own streaming sink uses. Each micro-batch append commits with
    ``txn=(app_id, batch_id)``; a replayed batch (failure between the
    sink commit and the checkpoint write) is detected by
    ``txn_version(app_id) >= batch_id`` and skipped, so re-runs are
    idempotent and the table stays interop-readable (delta-spark /
    DuckDB / Polars) throughout the stream.

    Scale shape: the watermark check is a control-plane log replay (no
    data scan); each batch lands via one distributed parquet write; the
    txn watermark survives log checkpointing (the parquet checkpoint
    carries the latest txn per appId)."""

    def __init__(self, table, app_id: str):
        self.table = table
        self.app_id = app_id

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        if self.table.exists() and self.table.txn_version(self.app_id) >= batch_id:
            return  # replayed micro-batch — already durable, skip
        self.table.write(df, mode="append", txn=(self.app_id, batch_id))

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self.write_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = writer.start()
        return q


class IcebergStreamSink:
    """Exactly-once streaming sink into an Apache Iceberg table —
    :class:`DeltaStreamSink`'s cross-format twin, using the
    Flink-connector idempotence pattern: each micro-batch appends ONE
    snapshot whose summary carries (``app-id``, ``batch-id``); a
    replayed batch (failure between the snapshot commit and the
    checkpoint write) is detected by ``txn_version(app_id) >=
    batch_id`` and skipped. The watermark check is a metadata read (no
    data scan); each batch lands via one distributed parquet write +
    one Avro manifest."""

    def __init__(self, table, app_id: str):
        self.table = table
        self.app_id = app_id

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        if self.table.exists() and self.table.txn_version(self.app_id) >= batch_id:
            return  # replayed micro-batch — already durable, skip
        self.table.append(df, txn=(self.app_id, batch_id))

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self.write_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = writer.start()
        return q
