#!/usr/bin/env python
"""r8 octave probe, part 2: scale behavior of the late-r8 features.

Measures, at 1x vs Nx replicated fixtures (scale_probe generator):
- REORG PURGE surgicality: table scales Nx but the DV'd slice stays
  FIXED-SIZE — purge wall must stay ~flat (O(DV'd bytes), not
  O(table)); the full-table optimize() on the same snapshot is the
  contrast line.
- Hilbert clustering: build cost (one curve-sorted rewrite) should
  track data ~linearly; per-dimension pruning fraction at the same
  file-per-rows budget should stay ~constant and be ≥ Z-order's on
  the same data (grid-neighbor property).
- Version checksum: .crc write amortized into each commit (measured
  as commit overhead vs a log with crc suppressed) and
  validate_checksum wall (one replay, no data scan) — both
  metadata-bound.

Usage: python tools/r8b_octaves.py [--factor 8] [--out /tmp/r8b_octave]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/r8b_octave")
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
    spark.sparkContext.setLogLevel("ERROR")
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.readers import load_table

    big = os.path.join(args.out, f"x{args.factor}")
    if not os.path.exists(os.path.join(big, "lineitem.parquet")):
        os.makedirs(big, exist_ok=True)
        replicate(spark, args.sf, big, args.factor, tables=["lineitem"])

    def timed(fn):
        t0 = time.time()
        r = fn()
        return time.time() - t0, r

    results = {}

    # ---- REORG PURGE: fixed DV'd slice, scaled table ----
    # the deleted key range is IDENTICAL at both scales (copy 0 keys
    # only), so the purge's work set is constant while the table grows
    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        li = load_table(spark, sfd, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        td = os.path.join(args.out, f"purge_{tag}")
        shutil.rmtree(td, ignore_errors=True)
        dl = DeltaLogTable(spark, td)
        dl.write(li.repartitionByRange(32, "l_orderkey"), mode="append")
        res = dl.delete("l_orderkey <= 2000")  # copy-0-only keys
        pt, pr = timed(dl.reorg_purge)
        adds, *_ = dl._snapshot()
        results[f"purge_files_{tag}"] = f"{pr['files_purged']}/{len(adds)}"
        results[f"purge_rows_{tag}"] = pr["rows_purged"]
        results[f"purge_wall_{tag}"] = round(pt, 2)
        assert pr["rows_purged"] == res["rows_deleted"]

    # ---- Hilbert vs Z-order: build cost + pruning fraction ----
    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        li = load_table(spark, sfd, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_quantity"
        )
        n = li.count()
        files = max(16, n // 40_000)  # constant rows-per-file budget
        q_ok = int(li.approxQuantile("l_orderkey", [0.05], 0.001)[0])
        q_sk = int(li.approxQuantile("l_suppkey", [0.05], 0.001)[0])
        for curve in ("hilbert", "zorder"):
            td = os.path.join(args.out, f"{curve}_{tag}")
            shutil.rmtree(td, ignore_errors=True)
            dl = DeltaLogTable(spark, td)
            dl.write(li.repartition(32), mode="append")
            kw = {f"{curve}_by": ["l_orderkey", "l_suppkey"]}
            bt, _ = timed(lambda: dl.optimize(target_files=files, **kw))
            fr = []
            for pred in (f"l_orderkey <= {q_ok}", f"l_suppkey <= {q_sk}"):
                info = dl.scan_info(pred)
                fr.append(round(1 - info["n_pruned"] / (info["n_pruned"] + info["n_read"]), 3))
            results[f"{curve}_build_{tag}"] = round(bt, 2)
            results[f"{curve}_readfrac_{tag}"] = fr

    # ---- version checksum: commit overhead + validate wall ----
    td = os.path.join(args.out, "crc")
    shutil.rmtree(td, ignore_errors=True)
    dl = DeltaLogTable(spark, td)
    base = load_table(spark, args.sf, "lineitem").select("l_orderkey", "l_quantity").limit(5000)
    ct, _ = timed(lambda: [dl.write(base, mode="append") for _ in range(10)])
    vt, res = timed(lambda: DeltaLogTable(spark, td).validate_checksum())
    results["crc_10_commits_wall"] = round(ct, 2)
    results["crc_validate_wall"] = round(vt, 3)
    results["crc_validated"] = res["validated"]

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
