"""Open-source Delta tables as a Structured-Streaming SOURCE.

The reference streams FROM its Delta tables
(`/root/reference/Instructor/01-Fraud-Delta.py:175-176`,
``spark.readStream.format('delta')``); :mod:`streaming.lake_source`
covers the engine's own log — this is the same contract over the
PUBLIC ``_delta_log`` format, so a user can point a stream at a table
produced by delta-spark (or by this engine's Delta writer) without
converting it:

    spark.readStream.format("delta_stream").option("path", p).load()

Offsets are Delta versions. The FIRST microbatch is the table's
INITIAL SNAPSHOT — the reconciled current state (adds minus removes,
deletion vectors applied), never a replay of files removed before the
stream started — matching Delta's streaming semantics; subsequent
microbatches cover the ``add`` actions of commits in (start, end] —
exactly-once because the log is append-only with dense versions.
Post-snapshot commits that ``remove`` files or attach deletion
vectors are REWRITES of already-streamed data and abort the stream
unless ``ignoreChanges=true`` (Delta's own streaming contract).
Partition columns (absent from the physical parquet) are re-attached
per file from the add action's ``partitionValues``.

One InputPartition per added data file; read() yields pyarrow
RecordBatches (Arrow fast path, bounded memory). Classes live in a
factory closure so cloudpickle ships them by value to data-source
workers (no repo on their sys.path).
"""

from __future__ import annotations


def make_delta_stream_source():
    """Build the DataSource class (self-contained, pickled by value)."""
    import json
    import os

    # see make_iceberg_stream_source: the planning runner process has
    # no repo on sys.path — bootstrap from the factory-captured root
    _repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    def _bootstrap() -> None:
        import sys as _sys

        if _repo_root not in _sys.path:
            _sys.path.insert(0, _repo_root)

    from pyspark.sql import types as T
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    def version_files(table_path: str) -> dict[int, str]:
        log = os.path.join(table_path, "_delta_log")
        out: dict[int, str] = {}
        if os.path.isdir(log):
            for f in os.listdir(log):
                stem, ext = os.path.splitext(f)
                if ext == ".json" and stem.isdigit():
                    out[int(stem)] = os.path.join(log, f)
        return out

    def actions(path: str) -> list[dict]:
        with open(path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def table_meta(table_path: str) -> dict:
        meta = None
        for v in sorted(version_files(table_path)):
            for act in actions(version_files(table_path)[v]):
                if "metaData" in act:
                    meta = act["metaData"]
        if meta is None:
            raise ValueError(f"no Delta metaData under {table_path}/_delta_log")
        return meta

    def col_mapping(meta: dict) -> tuple:
        """((logical, physical, field_id|None), …) under column
        mapping, or () for an unmapped table. Field ids are carried
        only in id mode (resolution by parquet field id)."""
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if mode == "none":
            return ()
        if mode not in ("name", "id"):
            raise NotImplementedError(
                f"streaming over column mapping mode {mode!r} is not supported"
            )
        out = []
        for f in json.loads(meta["schemaString"])["fields"]:
            md = f.get("metadata") or {}
            phys = md.get("delta.columnMapping.physicalName", f["name"])
            fid = md.get("delta.columnMapping.id") if mode == "id" else None
            out.append((f["name"], phys, int(fid) if fid is not None else None))
        return tuple(out)

    class FilePartition(InputPartition):
        def __init__(
            self,
            abs_path: str,
            pv: dict,
            schema_json: str,
            part_cols: list[str],
            deleted: tuple = (),
            ctype: str | None = None,
            commit_version: int | None = None,
            kept: tuple = (),
            file_has_ctype: bool = False,
            colmap: tuple = (),
        ):
            self.abs_path = abs_path
            self.pv = pv
            self.schema_json = schema_json
            self.part_cols = part_cols
            # column mapping: ((logical, physical, field_id|None), …);
            # workers resolve physical arrow columns back to logical
            self.colmap = colmap
            # file-local row indexes masked by a deletion vector
            # (initial snapshot only; decoded driver-side, filtered
            # executor-side with numpy — no repo import on workers)
            self.deleted = deleted
            # change-feed mode: constant _change_type / _commit_version
            # for this partition; `kept` restricts to exactly these
            # row indexes (DV-diff deletes); cdc `_change_data` files
            # carry their own _change_type column instead
            self.ctype = ctype
            self.commit_version = commit_version
            self.kept = kept
            self.file_has_ctype = file_has_ctype

    class DeltaStreamReader(DataSourceStreamReader):
        def __init__(
            self,
            table_path: str,
            ignore_changes: bool,
            max_versions_per_trigger: int | None = None,
            change_feed: bool = False,
            starting_version: int | str | None = None,
        ):
            self.table_path = table_path
            self.ignore_changes = ignore_changes
            self.change_feed = change_feed
            # startingVersion (Delta's option of the same name): skip
            # the initial snapshot and stream CHANGES from this commit
            # on — "latest" resolves ONCE here, so only commits after
            # stream construction flow. With a startingVersion the
            # first batch uses the incremental branch even from -1
            # (startingVersion=0 = full history REPLAY, which differs
            # from the snapshot exactly when removes exist).
            if starting_version == "latest":
                vs0 = version_files(table_path)
                starting_version = (max(vs0) if vs0 else -1) + 1
            self.starting_version = starting_version
            # rate limiting (Delta's maxFilesPerTrigger idea at our
            # version-offset granularity): each micro-batch advances at
            # most N commit versions, so one trigger never ingests an
            # unbounded backlog — admission control for recovery after
            # downtime. Tracked from the last end WE handed out (the
            # engine calls latestOffset once per trigger).
            self.max_versions = max_versions_per_trigger
            self._last_end: int | None = None

        def initialOffset(self) -> dict:
            if self.starting_version is not None:
                return {"version": int(self.starting_version) - 1}
            return {"version": -1}

        def latestOffset(self) -> dict:
            vs = version_files(self.table_path)
            latest = max(vs) if vs else -1
            if self.max_versions is not None:
                base = (
                    self._last_end
                    if self._last_end is not None
                    else (
                        int(self.starting_version) - 1
                        if self.starting_version is not None
                        else -1
                    )
                )
                latest = min(latest, base + self.max_versions)
            if self.starting_version is not None:
                # never hand out an end below the start offset (e.g.
                # "latest" on a table with no new commits yet)
                latest = max(latest, int(self.starting_version) - 1)
            self._last_end = latest
            return {"version": latest}

        def commit(self, end: dict) -> None:
            # checkpoint committed through `end`; align the rate-limit
            # cursor with what the engine durably processed
            self._last_end = end["version"]

        def _cdf_partitions(self, lo: int, hi: int):
            """Change-feed partitions for commits in (lo, hi] — the
            batch ``read_changes`` synthesis (cdc files verbatim; adds
            → inserts; removes → deletes; DV-diff re-adds → deletes of
            the newly-masked rows), driver-side planned, worker-read.
            Stateless in (lo, hi] so WAL replay re-plans identically."""
            import os as _os

            from pyspark.sql import SparkSession

            _bootstrap()
            from ent_fins_lakehouse_spark.sources.lakehouse import (
                DeltaLogTable,
                _dv_row_indexes_of,
            )

            meta = table_meta(self.table_path)
            cmap = col_mapping(meta)
            part_cols = list(meta.get("partitionColumns") or [])
            schema_json = meta["schemaString"]
            vs = version_files(self.table_path)
            dl = DeltaLogTable(SparkSession.getActiveSession(), self.table_path)
            prev_adds: dict[str, dict] = {}
            if lo >= 0:
                prev_adds, *_ = dl._snapshot(lo)
            live = set(prev_adds)
            prior_dv = {
                p: set(_dv_row_indexes_of(self.table_path, i["deletionVector"]))
                for p, i in prev_adds.items()
                if i.get("deletionVector")
            }
            parts = []
            for v in sorted(vs):
                if not (lo < v <= hi):
                    continue
                acts = actions(vs[v])
                cdc = [a["cdc"] for a in acts if "cdc" in a]
                if cdc:
                    for c in cdc:
                        parts.append(
                            FilePartition(
                                _os.path.join(self.table_path, c["path"]),
                                c.get("partitionValues") or {},
                                schema_json,
                                part_cols,
                                commit_version=v,
                                file_has_ctype=True,
                                colmap=cmap,
                            )
                        )
                    # cdc carries the changes, but add/remove still move
                    # the live-file/DV state later synthesized commits
                    # diff against (the batch read_changes rule)
                    for a in acts:
                        if "add" in a:
                            ad = a["add"]
                            dv = ad.get("deletionVector")
                            live.add(ad["path"])
                            prior_dv[ad["path"]] = (
                                set(_dv_row_indexes_of(self.table_path, dv))
                                if dv
                                else set()
                            )
                        elif "remove" in a:
                            live.discard(a["remove"]["path"])
                    continue
                for a in acts:
                    if "add" in a and not a["add"].get("dataChange", True):
                        # dataChange=false (OPTIMIZE/REORG): nothing to
                        # emit, but the file set moves — track it (the
                        # batch read_changes rule), else a later DV
                        # delete on a compacted file synthesizes as a
                        # whole-file 'insert'
                        ad = a["add"]
                        dv = ad.get("deletionVector")
                        live.add(ad["path"])
                        prior_dv[ad["path"]] = (
                            set(_dv_row_indexes_of(self.table_path, dv))
                            if dv
                            else set()
                        )
                    elif "remove" in a and not a["remove"].get("dataChange", True):
                        live.discard(a["remove"]["path"])
                    elif "add" in a and a["add"].get("dataChange", True):
                        ad = a["add"]
                        pv = ad.get("partitionValues") or {}
                        dv = ad.get("deletionVector")
                        new_dv = (
                            set(_dv_row_indexes_of(self.table_path, dv))
                            if dv
                            else set()
                        )
                        if ad["path"] in live:
                            newly = new_dv - prior_dv.get(ad["path"], set())
                            if newly:
                                parts.append(
                                    FilePartition(
                                        _os.path.join(self.table_path, ad["path"]),
                                        pv,
                                        schema_json,
                                        part_cols,
                                        ctype="delete",
                                        commit_version=v,
                                        kept=tuple(sorted(newly)),
                                        colmap=cmap,
                                    )
                                )
                        else:
                            parts.append(
                                FilePartition(
                                    _os.path.join(self.table_path, ad["path"]),
                                    pv,
                                    schema_json,
                                    part_cols,
                                    deleted=tuple(sorted(new_dv)),
                                    ctype="insert",
                                    commit_version=v,
                                    colmap=cmap,
                                )
                            )
                            live.add(ad["path"])
                        prior_dv[ad["path"]] = new_dv
                    elif "remove" in a and a["remove"].get("dataChange", True):
                        rm = a["remove"]
                        full = _os.path.join(self.table_path, rm["path"])
                        if not _os.path.isfile(full):
                            raise RuntimeError(
                                f"change feed needs removed file {rm['path']} "
                                "(vacuumed away?)"
                            )
                        parts.append(
                            FilePartition(
                                full,
                                rm.get("partitionValues") or {},
                                schema_json,
                                part_cols,
                                deleted=tuple(sorted(prior_dv.get(rm["path"], ()))),
                                ctype="delete",
                                commit_version=v,
                                colmap=cmap,
                            )
                        )
                        live.discard(rm["path"])
            return parts or [FilePartition("", {}, "", [])]

        def partitions(self, start: dict, end: dict):
            lo, hi = start["version"], end["version"]
            # restart alignment: after recovery the checkpointed start
            # may be ahead of our fresh rate-limit cursor
            if self._last_end is None or self._last_end < lo:
                self._last_end = lo
            if self.change_feed:
                return self._cdf_partitions(lo, hi)
            meta = table_meta(self.table_path)
            part_cols = list(meta.get("partitionColumns") or [])
            schema_json = meta["schemaString"]
            cmap = col_mapping(meta)
            vs = version_files(self.table_path)
            parts = []
            if lo < 0 and self.starting_version is None:
                # INITIAL SNAPSHOT (Delta's streaming semantics): the
                # first batch is the reconciled state as of `hi` — adds
                # minus removes, deletion vectors applied — never a
                # replay of files removed before the stream started.
                # Historical rewrites are fine here; only commits
                # AFTER the snapshot fall under the ignoreChanges
                # contract.
                live: dict[str, dict] = {}
                for v in sorted(vs):
                    if v > hi:
                        break
                    for act in actions(vs[v]):
                        if "add" in act:
                            live[act["add"]["path"]] = act["add"]
                        elif "remove" in act:
                            live.pop(act["remove"]["path"], None)
                for path in sorted(live):
                    a = live[path]
                    deleted: tuple = ()
                    if a.get("deletionVector"):
                        # driver-side decode (partition planning runs
                        # on the driver, where the repo is importable)
                        _bootstrap()
                        from ent_fins_lakehouse_spark.sources.lakehouse import (
                            _dv_row_indexes_of,
                        )

                        deleted = tuple(
                            _dv_row_indexes_of(self.table_path, a["deletionVector"])
                        )
                    parts.append(
                        FilePartition(
                            os.path.join(self.table_path, path),
                            a.get("partitionValues") or {},
                            schema_json,
                            part_cols,
                            deleted,
                            colmap=cmap,
                        )
                    )
                return parts or [FilePartition("", {}, "", [])]
            for v in sorted(vs):
                if not (lo < v <= hi):
                    continue
                for act in actions(vs[v]):
                    # dataChange=false actions (OPTIMIZE/compaction)
                    # rearrange rows the stream already emitted — Delta
                    # streams skip them without needing ignoreChanges
                    if "remove" in act and act["remove"].get("dataChange", True) is False:
                        continue
                    if "remove" in act and not self.ignore_changes:
                        raise RuntimeError(
                            f"Delta commit v{v} removes data files; streaming "
                            "from a table with updates/deletes requires "
                            "option ignoreChanges=true"
                        )
                    if "add" not in act:
                        continue
                    a = act["add"]
                    if a.get("dataChange", True) is False:
                        continue
                    if a.get("deletionVector"):
                        if self.ignore_changes:
                            continue  # rewrite of already-streamed rows
                        raise RuntimeError(
                            f"Delta commit v{v} attaches a deletion vector "
                            f"to {a['path']} (row-level rewrite); pass "
                            "ignoreChanges=true to skip such commits"
                        )
                    parts.append(
                        FilePartition(
                            os.path.join(self.table_path, a["path"]),
                            a.get("partitionValues") or {},
                            schema_json,
                            part_cols,
                            colmap=cmap,
                        )
                    )
            return parts or [FilePartition("", {}, "", [])]

        def read(self, partition):
            if not partition.abs_path or not os.path.isfile(partition.abs_path):
                return iter(())
            import pyarrow as pa
            import pyarrow.parquet as pq

            spark_schema = T.StructType.fromJson(json.loads(partition.schema_json))

            def pa_typed(field: T.StructField, raw, n: int):
                """Partition value (string in the log) → typed constant
                arrow array matching the declared Spark field type."""
                t = field.dataType
                if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType)):
                    val, at = (None if raw is None else int(raw)), pa.int32()
                elif isinstance(t, T.LongType):
                    val, at = (None if raw is None else int(raw)), pa.int64()
                elif isinstance(t, T.FloatType):
                    val, at = (None if raw is None else float(raw)), pa.float32()
                elif isinstance(t, T.DoubleType):
                    val, at = (None if raw is None else float(raw)), pa.float64()
                elif isinstance(t, T.BooleanType):
                    val, at = (None if raw is None else str(raw).lower() == "true"), pa.bool_()
                else:
                    val, at = (None if raw is None else str(raw)), pa.string()
                return pa.array([val] * n, type=at)

            def gen():
                import numpy as np

                darr = (
                    np.fromiter(sorted(partition.deleted), dtype="int64")
                    if getattr(partition, "deleted", ())
                    else None
                )
                karr = (
                    np.fromiter(sorted(getattr(partition, "kept", ())), dtype="int64")
                    if getattr(partition, "kept", ())
                    else None
                )
                cdf = getattr(partition, "commit_version", None) is not None
                off = 0
                pf = pq.ParquetFile(partition.abs_path)
                # column mapping: build arrow-column-name → logical-name
                # resolution — by parquet FIELD ID when present (id
                # mode), else by physical name (name mode)
                log_of: dict = {}
                cmap = getattr(partition, "colmap", ()) or ()
                if cmap:
                    fid_to_arrow: dict = {}
                    sch = pf.schema_arrow
                    for i in range(len(sch.names)):
                        fld = sch.field(i)
                        raw = (fld.metadata or {}).get(b"PARQUET:field_id")
                        if raw is not None:
                            fid_to_arrow[int(raw)] = fld.name
                    for logical, phys, fid in cmap:
                        if fid is not None and fid in fid_to_arrow:
                            log_of[fid_to_arrow[fid]] = logical
                        else:
                            log_of[phys] = logical
                for batch in pf.iter_batches():
                    n_in = batch.num_rows
                    idx = np.arange(off, off + n_in, dtype="int64")
                    mask = np.ones(n_in, dtype=bool)
                    if darr is not None:
                        mask &= ~np.isin(idx, darr)
                    if karr is not None:
                        mask &= np.isin(idx, karr)
                    if not mask.all():
                        batch = batch.filter(pa.array(mask))
                    off += n_in
                    if batch.num_rows == 0:
                        continue
                    by_name = {
                        log_of.get(n, n): batch.column(i)
                        for i, n in enumerate(batch.schema.names)
                    }
                    phys_of = {lg: ph for lg, ph, _ in cmap}
                    for c in partition.part_cols:
                        # partitionValues are keyed by PHYSICAL name
                        # under column mapping
                        by_name[c] = pa_typed(
                            spark_schema[c],
                            partition.pv.get(phys_of.get(c, c)),
                            batch.num_rows,
                        )
                    # emit in the DECLARED schema's field order — the
                    # data-source contract maps columns positionally
                    names = [f.name for f in spark_schema.fields]
                    cols = [by_name[n] for n in names]
                    if cdf:
                        n_rows = batch.num_rows
                        if getattr(partition, "file_has_ctype", False):
                            ct = by_name["_change_type"]
                        else:
                            ct = pa.array([partition.ctype] * n_rows, type=pa.string())
                        cols = cols + [
                            ct,
                            pa.array(
                                [partition.commit_version] * n_rows, type=pa.int64()
                            ),
                        ]
                        names = names + ["_change_type", "_commit_version"]
                    yield pa.RecordBatch.from_arrays(cols, names=names)

            return gen()

        def commit(self, end: dict) -> None:
            pass  # offsets are durable in the query checkpoint

    class DeltaStreamDataSource(DataSource):
        """``format("delta_stream")`` — options: path, ignoreChanges."""

        @classmethod
        def name(cls) -> str:
            return "delta_stream"

        def schema(self):
            meta = table_meta(self.options["path"])
            col_mapping(meta)  # raises on unsupported mapping modes
            base = T.StructType.fromJson(json.loads(meta["schemaString"]))
            if self.options.get("readchangefeed", "false").lower() == "true":
                return T.StructType(
                    [
                        *base.fields,
                        T.StructField("_change_type", T.StringType()),
                        T.StructField("_commit_version", T.LongType()),
                    ]
                )
            return base

        def streamReader(self, schema):
            mv = self.options.get("maxversionspertrigger")
            sv = self.options.get("startingversion")
            if sv is not None and sv != "latest":
                sv = int(sv)
                if sv < 0:
                    raise ValueError(f"startingVersion must be >= 0, got {sv}")
            return DeltaStreamReader(
                self.options["path"],
                self.options.get("ignorechanges", "false").lower() == "true",
                int(mv) if mv else None,
                self.options.get("readchangefeed", "false").lower() == "true",
                sv,
            )

    return DeltaStreamDataSource


def register(spark) -> None:
    spark.dataSource.register(make_delta_stream_source())


def read_delta_stream(
    spark,
    path: str,
    ignore_changes: bool = False,
    max_versions_per_trigger: int | None = None,
    read_change_feed: bool = False,
    starting_version: int | str | None = None,
):
    """Continuously read a public-format Delta table as it is appended.
    ``max_versions_per_trigger`` bounds how many commit versions one
    micro-batch ingests (Delta's maxFilesPerTrigger idea at version
    granularity) — admission control when recovering a large backlog.
    ``starting_version`` (int or "latest") skips the initial snapshot
    and streams changes from that commit on — how a downstream
    attaches to a table whose history it already holds."""
    register(spark)
    r = (
        spark.readStream.format("delta_stream")
        .option("path", path)
        .option("ignoreChanges", str(ignore_changes).lower())
    )
    if max_versions_per_trigger is not None:
        r = r.option("maxVersionsPerTrigger", str(max_versions_per_trigger))
    if read_change_feed:
        r = r.option("readChangeFeed", "true")
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    return r.load()
