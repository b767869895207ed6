#!/usr/bin/env python
"""r8 octave probe: scale behavior of the round-8 features.

Measures, at 1x vs 8x replicated fixtures (scale_probe generator):
- Iceberg hour(ts): build cost and the pruned 6-hour window scan
  (pruned fraction must stay constant; scan cost tracks the WINDOW,
  not the corpus)
- Iceberg bucket[32] over strings: build cost and a point-lookup
  probe (reads one bucket at any scale)
- Delta minor log compaction: snapshot replay wall with N tail JSON
  commits vs the same log compacted (replay O(compactions + tail))
- logical-conflict rebase: MERGE commit wall while losing the race
  to interleaved blind appends (no starvation, bounded retries)

Usage: python tools/r8_octaves.py [--factor 8] [--out /tmp/r8_octave]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/r8_octave")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from tools.scale_probe import replicate

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable, LakeTable
    from ent_fins_lakehouse_spark.sources.readers import load_table

    big = os.path.join(args.out, f"x{args.factor}")
    if not os.path.exists(os.path.join(big, "events.parquet")):
        os.makedirs(big, exist_ok=True)
        replicate(spark, args.sf, big, args.factor, tables=["events", "documents"])

    def timed(fn):
        t0 = time.time()
        r = fn()
        return time.time() - t0, r

    results = {}

    # ---- hour(ts) ----
    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        ev = load_table(spark, sfd, "events").select("event_id", "ts", "user_id", "value")
        tdir = os.path.join(args.out, f"icehour_{tag}")
        shutil.rmtree(tdir, ignore_errors=True)
        t = IcebergTable(spark, tdir)
        bt, _ = timed(lambda: t.append(ev.repartition(32), partition_by=["hour(ts)"]))
        pred = "ts >= '2024-01-10 06:00:00' AND ts < '2024-01-10 12:00:00'"
        info = t.scan_info(pred)
        pt, n = timed(lambda: t.read(where=pred).count())
        results[f"hour_build_{tag}"] = round(bt, 2)
        results[f"hour_probe_{tag}"] = round(pt, 2)
        results[f"hour_frac_{tag}"] = round(info["n_read"] / info["n_active"], 4)
        results[f"hour_rows_{tag}"] = n

    # ---- string bucket ----
    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        docs = load_table(spark, sfd, "documents").select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("uid"),
            "source",
            "n_chars",
        )
        tdir = os.path.join(args.out, f"icestrb_{tag}")
        shutil.rmtree(tdir, ignore_errors=True)
        t = IcebergTable(spark, tdir)
        bt, _ = timed(lambda: t.append(docs.repartition(32), partition_by=["bucket(32, uid)"]))
        info = t.scan_info("uid = 'doc-42'")
        pt, n = timed(lambda: t.read(where="uid = 'doc-42'").count())
        results[f"strb_build_{tag}"] = round(bt, 2)
        results[f"strb_probe_{tag}"] = round(pt, 2)
        results[f"strb_frac_{tag}"] = round(info["n_read"] / info["n_active"], 4)

    # ---- log compaction replay ----
    td = os.path.join(args.out, "logcomp")
    shutil.rmtree(td, ignore_errors=True)
    dl = DeltaLogTable(spark, td)
    base = load_table(spark, args.sf, "events").select("event_id", "value").limit(1000)
    n_commits = 40
    for i in range(n_commits):
        dl.write(base.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000)), mode="append")
    # fresh handle each time => no cached state
    rt_json, _ = timed(lambda: DeltaLogTable(spark, td)._snapshot())
    # compact everything since the last checkpoint in 5-commit stripes
    last_cp = (dl._checkpoint() or (0,))[0]
    s = last_cp + 1 if dl._checkpoint() else 0
    latest = dl.latest_version()
    v = s
    while v + 4 <= latest:
        dl.compact_log(v, v + 4)
        v += 5
    rt_comp, _ = timed(lambda: DeltaLogTable(spark, td)._snapshot())
    results["logcomp_replay_json"] = round(rt_json, 3)
    results["logcomp_replay_compacted"] = round(rt_comp, 3)
    results["logcomp_commits"] = n_commits

    # ---- conflict rebase throughput ----
    td2 = os.path.join(args.out, "rebase")
    shutil.rmtree(td2, ignore_errors=True)
    lt = LakeTable(spark, td2)
    lt.write(spark.range(1000).selectExpr("CAST(id AS INT) k", "CAST(id AS INT) v"))
    real = LakeTable._try_commit
    state = {"n": 0}

    def inject(self, commit):
        if commit.operation == "merge" and state["n"] < 3:
            state["n"] += 1
            LakeTable(self.spark, self.path).write(
                self.spark.createDataFrame([(10_000 + state["n"], -1)], "k INT, v INT"),
                mode="append",
            )
        return real(self, commit)

    src = spark.range(0, 100).selectExpr("CAST(id AS INT) k", "CAST(id * 7 AS INT) v")
    LakeTable._try_commit = inject
    try:
        mt, _ = timed(lambda: lt.merge(src, on=["k"]))
    finally:
        LakeTable._try_commit = real
    results["rebase_merge_wall_3appends"] = round(mt, 2)
    results["rebase_interleaved_appends"] = state["n"]
    results["rebase_rows_final"] = lt.read().count()

    import json

    print(json.dumps(results, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
