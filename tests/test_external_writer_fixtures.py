"""Hand-authored EXTERNAL-writer fixtures for the reader edge cases
(VERDICT r13 item 5).

Interop tests elsewhere mostly round-trip through this engine's own
writers; these fixtures are authored byte-by-byte per the PUBLIC specs
(Iceberg spec 'Manifests'/'Partition Transforms'/'Position Delete
Files'; Delta PROTOCOL.md 'Checkpoints') by the TEST, independently of
the engine's write path — the q184 external-fixture precedent. The two
highest-value shapes per the r13 verdict:

(a) an Iceberg v2 table with ``bucket[n]`` partitioning and a parquet
    position-delete file, bucket ordinals computed by an INDEPENDENT
    pure-Python murmur3_x86_32 (so the engine's vectorized transform is
    cross-checked, not self-checked);
(b) a Delta log whose MULTI-PART checkpoint carries typed
    ``stats_parsed`` / ``partitionValues_parsed`` structs and NO json
    ``stats``/``partitionValues`` (delta-spark's
    ``writeStatsAsJson=false`` + ``writeStatsAsStruct=true`` shape),
    with a post-checkpoint JSON commit to replay on top.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


# ------------------------------------------------- independent murmur3


def _mmh3_x86_32(data: bytes, seed: int = 0) -> int:
    """Pure-Python murmur3_x86_32 (Appleby's public algorithm) — the
    INDEPENDENT twin of the engine's vectorized transform."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data) // 4 * 4
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _bucket_long(v: int, n: int) -> int:
    """Iceberg ``bucket[n]`` over a long: murmur3_x86_32 of the
    little-endian 8-byte value, int-range-masked, mod n (spec
    'Bucket Transform Details')."""
    return (_mmh3_x86_32(struct.pack("<q", v)) & 0x7FFFFFFF) % n


# --------------------------------------------- (a) Iceberg fixture


N_BUCKETS = 4


def _author_iceberg_bucket_posdel(table_dir: str) -> dict:
    """Author the table as an external writer would: pyarrow data
    files grouped by independently-computed bucket ordinal, a parquet
    position-delete file, avro manifests with partition records, a
    manifest list, and v2 metadata JSON. Returns the expectations."""
    from ent_fins_lakehouse_spark.sources.avro_io import write_ocf
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    meta_dir = os.path.join(table_dir, "metadata")
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(meta_dir)
    os.makedirs(data_dir)

    rows = [(k, f"v{k}") for k in range(40)]
    by_bucket: dict[int, list[tuple[int, str]]] = {}
    for k, v in rows:
        by_bucket.setdefault(_bucket_long(k, N_BUCKETS), []).append((k, v))
    assert len(by_bucket) == N_BUCKETS, "fixture wants all buckets hit"

    ice_schema = {
        "schema-id": 0,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ],
    }
    part_fields = [
        {
            "name": "k_bucket",
            "transform": f"bucket[{N_BUCKETS}]",
            "source-id": 1,
            "field-id": 1000,
        }
    ]

    data_paths: dict[int, str] = {}
    entries = []
    for b, brows in sorted(by_bucket.items()):
        fpath = os.path.join(data_dir, f"k_bucket={b}", f"{uuid.uuid4().hex}.parquet")
        os.makedirs(os.path.dirname(fpath), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([k for k, _ in brows], pa.int64()),
                    "v": pa.array([v for _, v in brows], pa.string()),
                }
            ),
            fpath,
        )
        data_paths[b] = fpath
        entries.append(
            {
                "status": 1,
                "snapshot_id": 1,
                "sequence_number": 1,
                "data_file": {
                    "content": 0,
                    "file_path": fpath,
                    "file_format": "PARQUET",
                    "partition": {"k_bucket": b},
                    "record_count": len(brows),
                    "file_size_in_bytes": os.path.getsize(fpath),
                },
            }
        )

    # position-delete parquet per the spec ('Position Delete Files'):
    # (file_path, pos) rows, sorted — delete positions 0 and 2 of
    # bucket 0's file
    victims_file = data_paths[0]
    deleted_keys = [by_bucket[0][0][0], by_bucket[0][2][0]]
    del_path = os.path.join(data_dir, f"{uuid.uuid4().hex}-deletes.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([victims_file] * 2, pa.string()),
                "pos": pa.array([0, 2], pa.int64()),
            }
        ),
        del_path,
    )
    del_entry = {
        "status": 1,
        "snapshot_id": 2,
        "sequence_number": 2,
        "data_file": {
            "content": 1,
            "file_path": del_path,
            "file_format": "PARQUET",
            "partition": {"k_bucket": 0},
            "record_count": 2,
            "file_size_in_bytes": os.path.getsize(del_path),
        },
    }

    # a dummy engine handle ONLY to borrow the spec-shaped avro
    # schemas; nothing is written through it
    t = IcebergTable.__new__(IcebergTable)
    msch = t._manifest_schema(part_fields, ice_schema)

    data_manifest = os.path.join(meta_dir, f"m-data-{uuid.uuid4().hex}.avro")
    write_ocf(data_manifest, msch, entries)
    del_manifest = os.path.join(meta_dir, f"m-del-{uuid.uuid4().hex}.avro")
    write_ocf(del_manifest, msch, [del_entry])

    lpath = os.path.join(meta_dir, f"snap-2-{uuid.uuid4().hex}.avro")
    write_ocf(
        lpath,
        IcebergTable._MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": data_manifest,
                "manifest_length": os.path.getsize(data_manifest),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "added_snapshot_id": 1,
            },
            {
                "manifest_path": del_manifest,
                "manifest_length": os.path.getsize(del_manifest),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": 2,
                "added_snapshot_id": 2,
            },
        ],
    )
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": table_dir,
        "last-sequence-number": 2,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "schemas": [ice_schema],
        "current-schema-id": 0,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": part_fields}],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 2,
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 1700000000000,
                "manifest-list": lpath,
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": 2,
                "sequence-number": 2,
                "timestamp-ms": 1700000001000,
                "manifest-list": lpath,
                "summary": {"operation": "delete"},
            },
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return {
        "deleted_keys": deleted_keys,
        "by_bucket": by_bucket,
        "data_paths": data_paths,
    }


def test_external_iceberg_bucket_partition_position_deletes(spark, tmp_path):
    """The engine reads an externally-laid-out bucket-partitioned
    Iceberg v2 table with parquet position deletes: content minus the
    deleted positions, and point predicates prune to the single
    matching bucket's file via the manifest partition tuples."""
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    td = str(tmp_path / "ice_ext")
    os.makedirs(td)
    exp = _author_iceberg_bucket_posdel(td)
    t = IcebergTable(spark, td)

    got = {r["k"]: r["v"] for r in t.read().collect()}
    want = {k: f"v{k}" for k in range(40) if k not in exp["deleted_keys"]}
    assert got == want, "position deletes must subtract exactly their rows"

    # bucket pruning: a point predicate on the source column scans only
    # the matching bucket's file (manifest partition tuple + the
    # bucket-transform predicate rewrite)
    probe = max(want)
    b = _bucket_long(probe, N_BUCKETS)
    sub = t.read(where=f"k = {probe}")
    assert [r["v"] for r in sub.collect()] == [f"v{probe}"]
    scanned = {
        f for f in sub.inputFiles() if "-deletes" not in f
    }
    assert len(scanned) == 1 and exp["data_paths"][b] in "".join(scanned), (
        "point predicate must prune to the single matching bucket file"
    )

    # a deleted key's row stays deleted under the pruned scan too
    dk = exp["deleted_keys"][0]
    assert t.read(where=f"k = {dk}").count() == 0


# ----------------------------------------------- (b) Delta fixture


def _delta_schema_string() -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )


def _write_delta_data_file(path: str, ks: list[int], day: int) -> dict:
    """A data file as an external writer lays it out: partition column
    NOT materialized, timestamps annotated UTC micros. Returns the
    typed stats an external checkpoint writer would compute."""
    import datetime

    tss = [
        datetime.datetime(2024, 1, day, k % 24, 0, 0, tzinfo=datetime.timezone.utc)
        for k in ks
    ]
    pq.write_table(
        pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            }
        ),
        path,
    )
    return {
        "numRecords": len(ks),
        "min_k": min(ks),
        "max_k": max(ks),
        "min_ts": min(tss),
        "max_ts": max(tss),
    }


def _author_delta_multipart_checkpoint(table_dir: str) -> dict:
    """00.json (protocol+metaData+2 adds), 01.json (2 adds), a 2-part
    checkpoint at version 1 carrying ONLY typed structs (stats_parsed,
    partitionValues_parsed; json stats/partitionValues null), then
    02.json replayed on top. All bytes authored here, never by the
    engine's writer."""
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir)

    files = []  # (rel_path, partition, stats)
    plan = [
        ("p=a/part-00000.parquet", "a", list(range(0, 5)), 1),
        ("p=a/part-00001.parquet", "a", list(range(5, 10)), 1),
        ("p=b/part-00002.parquet", "b", list(range(100, 105)), 2),
        ("p=b/part-00003.parquet", "b", list(range(105, 110)), 2),
    ]
    for rel, p, ks, day in plan:
        fpath = os.path.join(table_dir, rel)
        os.makedirs(os.path.dirname(fpath), exist_ok=True)
        st = _write_delta_data_file(fpath, ks, day)
        files.append((rel, p, st))

    def add_json(rel, p, st):
        return {
            "add": {
                "path": rel,
                "partitionValues": {"p": p},
                "size": os.path.getsize(os.path.join(table_dir, rel)),
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": json.dumps(
                    {
                        "numRecords": st["numRecords"],
                        "minValues": {
                            "k": st["min_k"],
                            "ts": st["min_ts"].strftime("%Y-%m-%dT%H:%M:%S"),
                        },
                        "maxValues": {
                            "k": st["max_k"],
                            "ts": st["max_ts"].strftime("%Y-%m-%dT%H:%M:%S"),
                        },
                        "nullCount": {"k": 0, "ts": 0},
                    }
                ),
            }
        }

    meta = {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _delta_schema_string(),
            "partitionColumns": ["p"],
            "configuration": {},
            "createdTime": 1700000000000,
        }
    }
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for act in [
            {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
            proto,
            meta,
            add_json(*files[0]),
            add_json(*files[1]),
        ]:
            fh.write(json.dumps(act) + "\n")
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        for act in [
            {"commitInfo": {"timestamp": 1700000001000, "operation": "WRITE"}},
            add_json(*files[2]),
            add_json(*files[3]),
        ]:
            fh.write(json.dumps(act) + "\n")

    # ---- the 2-part checkpoint at version 1, typed structs only
    ts_t = pa.timestamp("us", tz="UTC")
    stats_t = pa.struct(
        [
            ("numRecords", pa.int64()),
            ("minValues", pa.struct([("k", pa.int64()), ("ts", ts_t)])),
            ("maxValues", pa.struct([("k", pa.int64()), ("ts", ts_t)])),
            ("nullCount", pa.struct([("k", pa.int64()), ("ts", pa.int64())])),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("partitionValues_parsed", pa.struct([("p", pa.string())])),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("stats_parsed", stats_t),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    cp_schema = pa.schema([("add", add_t), ("metaData", meta_t), ("protocol", proto_t)])

    def add_struct(rel, p, st):
        return {
            "path": rel,
            "partitionValues": None,  # struct form only — the shape under test
            "partitionValues_parsed": {"p": p},
            "size": os.path.getsize(os.path.join(table_dir, rel)),
            "modificationTime": 1700000000000,
            "dataChange": False,
            "stats": None,
            "stats_parsed": {
                "numRecords": st["numRecords"],
                "minValues": {"k": st["min_k"], "ts": st["min_ts"]},
                "maxValues": {"k": st["max_k"], "ts": st["max_ts"]},
                "nullCount": {"k": 0, "ts": 0},
            },
        }

    part1 = [
        {
            "add": None,
            "metaData": {
                "id": json.loads(json.dumps(meta["metaData"]["id"])),
                "format": {"provider": "parquet"},
                "schemaString": _delta_schema_string(),
                "partitionColumns": ["p"],
                "createdTime": 1700000000000,
            },
            "protocol": None,
        },
        {
            "add": None,
            "metaData": None,
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
        },
        {"add": add_struct(*files[0]), "metaData": None, "protocol": None},
        {"add": add_struct(*files[1]), "metaData": None, "protocol": None},
    ]
    part2 = [
        {"add": add_struct(*files[2]), "metaData": None, "protocol": None},
        {"add": add_struct(*files[3]), "metaData": None, "protocol": None},
    ]
    for i, rows in enumerate([part1, part2], start=1):
        pq.write_table(
            pa.Table.from_pylist(rows, schema=cp_schema),
            os.path.join(
                log_dir, f"{1:020d}.checkpoint.{i:010d}.{2:010d}.parquet"
            ),
        )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(part1) + len(part2), "parts": 2}, fh)

    # ---- a post-checkpoint commit to replay on top of the bootstrap
    rel5 = "p=c/part-00004.parquet"
    fpath5 = os.path.join(table_dir, rel5)
    os.makedirs(os.path.dirname(fpath5), exist_ok=True)
    st5 = _write_delta_data_file(fpath5, list(range(200, 203)), 3)
    with open(os.path.join(log_dir, f"{2:020d}.json"), "w") as fh:
        for act in [
            {"commitInfo": {"timestamp": 1700000002000, "operation": "WRITE"}},
            add_json(rel5, "c", st5),
        ]:
            fh.write(json.dumps(act) + "\n")
    return {"n_v0": 10, "n_v1": 20, "n_v2": 23}


def test_external_delta_multipart_struct_checkpoint(spark, tmp_path):
    """Bootstrap from an externally-authored MULTI-PART checkpoint
    whose adds carry ONLY typed stats_parsed / partitionValues_parsed
    (no json stats, null partitionValues map), replay the
    post-checkpoint commit, reconstruct partition columns, and prune
    soundly from the parsed struct stats — including timestamp ranges
    against 'T'-separator ISO literals (the r13 advisory class)."""
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    td = str(tmp_path / "delta_ext")
    os.makedirs(td)
    exp = _author_delta_multipart_checkpoint(td)
    t = DeltaLogTable(spark, td)

    assert t.latest_version() == 2
    df = t.read()
    assert df.count() == exp["n_v2"]
    # partition column reconstructed from partitionValues_parsed
    got_p = {r["p"] for r in df.select("p").distinct().collect()}
    assert got_p == {"a", "b", "c"}
    by_p = {
        r["p"]: r["n"]
        for r in df.groupBy("p").count().withColumnRenamed("count", "n").collect()
    }
    assert by_p == {"a": 10, "b": 10, "c": 3}

    # time travel beneath the checkpoint still replays pure JSON
    assert t.read(version_as_of=0).count() == exp["n_v0"]
    assert t.read(version_as_of=1).count() == exp["n_v1"]

    # skipping from the reconstructed struct stats: k ranges …
    info = t.scan_info("k >= 100")
    assert info["n_read"] == 3 and info["n_pruned"] == 2, info
    # … and timestamp ranges vs a 'T' ISO literal (day-2 files only;
    # the old default=str reconstruction compared ' ' < 'T' and pruned
    # the WRONG side)
    sub = t.read(where="ts >= '2024-01-02T00:00:00'")
    assert sub.count() == 13  # day-2 files (10) + the day-3 commit (3)
    info = t.scan_info("ts >= '2024-01-02T00:00:00'")
    assert info["n_pruned"] >= 2, info

    # partition pruning from the struct-sourced partition values
    info = t.scan_info("p = 'b'")
    assert info["n_read"] == 2 and info["n_pruned"] == 3, info


# ------------------------------------------- (c) Delta deletion vector


def _encode_roaring64_with_runs(bitmap_positions, run_spans) -> bytes:
    """An INDEPENDENT RoaringFormatSpec encoder covering container
    kinds this engine's own writer never emits: a RUN container
    (cookie 12347 + run bitset) beside a BITMAP container
    (cardinality > 4096). External writers (delta-spark / Rust
    kernels) produce exactly these, so the engine's decoder must be
    cross-checked against bytes its encoder cannot round-trip.

    ``bitmap_positions``: >4096 positions inside 16-bit chunk 0;
    ``run_spans``: [(start, stop_inclusive)] inside chunk 1."""
    magic = 1681511377
    out = [struct.pack("<i", magic), struct.pack("<Q", 1), struct.pack("<I", 0)]
    n_cont = 2
    # SERIAL_COOKIE with (containers - 1) in the high half + run bitset
    out.append(struct.pack("<I", 12347 | ((n_cont - 1) << 16)))
    out.append(bytes([0b00000010]))  # container 1 is the run container
    run_card = sum(b - a + 1 for a, b in run_spans)
    out.append(struct.pack("<HH", 0, len(bitmap_positions) - 1))
    out.append(struct.pack("<HH", 1, run_card - 1))
    # n_cont < 4 → no offset table (the spec's small-serialization rule)
    bits = bytearray(8192)
    for v in bitmap_positions:
        bits[v >> 3] |= 1 << (v & 7)
    out.append(bytes(bits))
    out.append(struct.pack("<H", len(run_spans)))
    for a, b in run_spans:
        out.append(struct.pack("<HH", a, b - a))  # length = count - 1
    return b"".join(out)


def test_external_delta_deletion_vector_run_and_bitmap_containers(spark, tmp_path):
    """A Delta log whose DV .bin is authored byte-by-byte per
    PROTOCOL.md 'Deletion Vectors' framing (version byte, [u32-BE
    size][payload][u32-BE crc], 'u' storage with the Base85 UUID name
    derivation) around an independently-encoded roaring payload using
    RUN + BITMAP containers. The engine's reader must subtract exactly
    those positions."""
    import base64
    import zlib

    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    td = str(tmp_path / "delta_dv")
    log_dir = os.path.join(td, "_delta_log")
    os.makedirs(log_dir)

    n_rows = 70_000
    rel = "part-00000.parquet"
    pq.write_table(
        pa.table({"k": pa.array(range(n_rows), pa.int64())}),
        os.path.join(td, rel),
    )

    bitmap_positions = list(range(0, 10_000, 2))  # 5,000 — bitmap container
    run_spans = [(10, 29), (100, 119)]  # chunk-1 runs → rows 65546.. etc.
    deleted = set(bitmap_positions) | {
        65_536 + v for a, b in run_spans for v in range(a, b + 1)
    }
    payload = _encode_roaring64_with_runs(bitmap_positions, run_spans)

    dv_uuid = uuid.uuid4()
    blob = b"\x01" + struct.pack(">i", len(payload)) + payload + struct.pack(
        ">i", zlib.crc32(payload) & 0x7FFFFFFF
    )
    with open(os.path.join(td, f"deletion_vector_{dv_uuid}.bin"), "wb") as fh:
        fh.write(blob)

    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    acts0 = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_str,
                "partitionColumns": [],
                "configuration": {"delta.enableDeletionVectors": "true"},
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(td, rel)),
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        },
    ]
    acts1 = [
        {"commitInfo": {"timestamp": 1700000001000, "operation": "DELETE"}},
        {"remove": {"path": rel, "dataChange": True, "deletionTimestamp": 1700000001000}},
        {
            "add": {
                "path": rel,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(td, rel)),
                "modificationTime": 1700000000000,
                "dataChange": False,
                "deletionVector": {
                    "storageType": "u",
                    "pathOrInlineDv": base64.b85encode(dv_uuid.bytes).decode(),
                    "offset": 1,
                    "sizeInBytes": len(payload),
                    "cardinality": len(deleted),
                },
            }
        },
    ]
    for v, acts in enumerate([acts0, acts1]):
        with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as fh:
            for act in acts:
                fh.write(json.dumps(act) + "\n")

    t = DeltaLogTable(spark, td)
    df = t.read()
    assert df.count() == n_rows - len(deleted)
    got_deleted_present = df.filter(
        df.k.isin([0, 2, 9998, 65_546, 65_655])
    ).count()
    assert got_deleted_present == 0, "masked positions leaked through"
    # survivors adjacent to every masked region are intact
    assert df.filter(df.k.isin([1, 9999, 10_000, 65_545, 65_656])).count() == 5
    # pre-DV version still serves all rows
    assert t.read(version_as_of=0).count() == n_rows


# --------------------- (d) Iceberg truncate/day transforms + eq deletes


def test_external_iceberg_truncate_day_partitioning_equality_deletes(spark, tmp_path):
    """External layout with the OTHER transform family: a spec carrying
    truncate[10] over a long and day over a timestamp, plus an
    equality-delete file (content=2, equality_ids=[1]) at a later
    sequence. Reads must subtract the equality-matched rows only from
    earlier-sequence data, and point/range predicates must prune via
    the manifest partition tuples (no footer bounds are written — the
    tuples are the only pruning information)."""
    import datetime

    from ent_fins_lakehouse_spark.sources.avro_io import write_ocf
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    td = str(tmp_path / "ice_td")
    meta_dir = os.path.join(td, "metadata")
    data_dir = os.path.join(td, "data")
    os.makedirs(meta_dir)
    os.makedirs(data_dir)

    ice_schema = {
        "schema-id": 0,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "ts", "required": False, "type": "timestamp"},
        ],
    }
    part_fields = [
        {"name": "k_trunc", "transform": "truncate[10]", "source-id": 1, "field-id": 1000},
        {"name": "ts_day", "transform": "day", "source-id": 2, "field-id": 1001},
    ]

    groups = [  # (k range, truncate tuple, day ordinal)
        (range(0, 10), 0, 0),
        (range(10, 20), 10, 1),
        (range(20, 30), 20, 2),
    ]
    entries, paths_by_trunc = [], {}
    for ks, trunc, day in groups:
        fpath = os.path.join(data_dir, f"{uuid.uuid4().hex}.parquet")
        tss = [
            datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            + datetime.timedelta(days=day, hours=k % 24)
            for k in ks
        ]
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(list(ks), pa.int64()),
                    "ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
                }
            ),
            fpath,
        )
        paths_by_trunc[trunc] = fpath
        entries.append(
            {
                "status": 1,
                "snapshot_id": 1,
                "sequence_number": 1,
                "data_file": {
                    "content": 0,
                    "file_path": fpath,
                    "file_format": "PARQUET",
                    "partition": {"k_trunc": trunc, "ts_day": day},
                    "record_count": len(list(ks)),
                    "file_size_in_bytes": os.path.getsize(fpath),
                },
            }
        )

    # equality-delete file: column k (field id 1), deleting 5 and 15
    del_path = os.path.join(data_dir, f"{uuid.uuid4().hex}-eqdel.parquet")
    pq.write_table(pa.table({"k": pa.array([5, 15], pa.int64())}), del_path)
    del_entry = {
        "status": 1,
        "snapshot_id": 2,
        "sequence_number": 2,
        "data_file": {
            "content": 2,
            "file_path": del_path,
            "file_format": "PARQUET",
            "partition": {"k_trunc": None, "ts_day": None},
            "record_count": 2,
            "file_size_in_bytes": os.path.getsize(del_path),
            "equality_ids": [1],
        },
    }

    t0 = IcebergTable.__new__(IcebergTable)
    msch = t0._manifest_schema(part_fields, ice_schema)
    # the engine's append schema has no equality_ids field (it never
    # writes eq deletes) — extend the data_file record the way an
    # external writer's schema would
    for f in msch["fields"]:
        if f["name"] == "data_file":
            f["type"]["fields"].append(
                {
                    "name": "equality_ids",
                    "type": ["null", {"type": "array", "items": "int"}],
                }
            )
    data_manifest = os.path.join(meta_dir, f"m-data-{uuid.uuid4().hex}.avro")
    write_ocf(data_manifest, msch, entries)
    del_manifest = os.path.join(meta_dir, f"m-del-{uuid.uuid4().hex}.avro")
    write_ocf(del_manifest, msch, [del_entry])
    lpath = os.path.join(meta_dir, f"snap-2-{uuid.uuid4().hex}.avro")
    write_ocf(
        lpath,
        IcebergTable._MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": data_manifest,
                "manifest_length": os.path.getsize(data_manifest),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "added_snapshot_id": 1,
            },
            {
                "manifest_path": del_manifest,
                "manifest_length": os.path.getsize(del_manifest),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": 2,
                "added_snapshot_id": 2,
            },
        ],
    )
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": td,
        "last-sequence-number": 2,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "schemas": [ice_schema],
        "current-schema-id": 0,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": part_fields}],
        "last-partition-id": 1001,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 2,
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 1700000000000,
                "manifest-list": lpath,
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": 2,
                "sequence-number": 2,
                "timestamp-ms": 1700000001000,
                "manifest-list": lpath,
                "summary": {"operation": "overwrite"},
            },
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    t = IcebergTable(spark, td)
    got = sorted(r["k"] for r in t.read().collect())
    assert got == sorted(set(range(30)) - {5, 15})

    # truncate-tuple pruning: k >= 20 reads only the third file
    sub = t.read(where="k >= 20")
    assert sorted(r["k"] for r in sub.collect()) == list(range(20, 30))
    scanned = {f for f in sub.inputFiles() if "eqdel" not in f}
    assert len(scanned) == 1 and paths_by_trunc[20] in "".join(scanned)

    # day-tuple pruning: the ordinals reconstruct [day, next-day) DATE
    # bounds, so an exact day-boundary literal conservatively keeps the
    # adjacent file (sound); a literal strictly INSIDE day 2 prunes to
    # the single day-2 file. Day-2 rows carry hour = k % 24, so the
    # 06:00 cut keeps k 20-23 only.
    sub = t.read(where="ts >= '1970-01-03T06:00:00'")
    assert sorted(r["k"] for r in sub.collect()) == [20, 21, 22, 23]
    scanned = {f for f in sub.inputFiles() if "eqdel" not in f}
    assert len(scanned) == 1 and paths_by_trunc[20] in "".join(scanned)

    # the eq-deleted keys stay deleted under pruned scans too
    assert t.read(where="k = 15").count() == 0


# ------------------------------- (e) Delta column mapping (name mode)


def test_external_delta_column_mapping_name_mode(spark, tmp_path):
    """delta-spark's REAL column-mapping output shape, authored
    externally: logical names live only in the schemaString metadata
    (`delta.columnMapping.physicalName` = 'col-<uuid>',
    `delta.columnMapping.id`), data files carry ONLY the physical
    names. A reader matching by logical name would return all-null
    columns silently — the wrong-answer class; resolution must go
    physical-name-first. Partition column physicalName also diverges
    from its logical name, so partitionValues reconstruction must map
    it too."""
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    td = str(tmp_path / "delta_cm")
    log_dir = os.path.join(td, "_delta_log")
    os.makedirs(log_dir)

    phys_k = f"col-{uuid.uuid4()}"
    phys_v = f"col-{uuid.uuid4()}"
    phys_p = f"col-{uuid.uuid4()}"

    rel = f"{phys_p}=a/part-00000.parquet"
    os.makedirs(os.path.join(td, f"{phys_p}=a"))
    pq.write_table(
        pa.table(
            {
                phys_k: pa.array([1, 2, 3], pa.int64()),
                phys_v: pa.array(["x", "y", "z"], pa.string()),
            }
        ),
        os.path.join(td, rel),
    )

    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": phys_k,
                    },
                },
                {
                    "name": "v",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": phys_v,
                    },
                },
                {
                    "name": "p",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 3,
                        "delta.columnMapping.physicalName": phys_p,
                    },
                },
            ],
        }
    )
    acts = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_str,
                "partitionColumns": ["p"],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                # physical partition dir + PHYSICAL key in partitionValues,
                # exactly as delta-spark lays it out under name mode
                "path": rel,
                "partitionValues": {phys_p: "a"},
                "size": os.path.getsize(os.path.join(td, rel)),
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for act in acts:
            fh.write(json.dumps(act) + "\n")

    t = DeltaLogTable(spark, td)
    df = t.read()
    assert set(df.columns) == {"k", "v", "p"}
    rows = {r["k"]: (r["v"], r["p"]) for r in df.collect()}
    assert rows == {1: ("x", "a"), 2: ("y", "a"), 3: ("z", "a")}, (
        "logical-name matching would have returned nulls here"
    )
