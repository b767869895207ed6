#!/usr/bin/env python
"""r11 octave probe: join-view maintenance cost at 1x vs Nx base size
with a FIXED-size change window.

The MaterializedJoinView refresh has two physical parts:
- the WHEN MATCHED THEN DELETE merges (touched-pk pair drops) — these
  scan the VIEW to find touched files (Delta merge's
  find-touched-files step), so their cost tracks the view's file
  count, mitigated at scale by stats pruning / partitioning;
- the re-derivation joins (broadcast delta >< base at current
  version) — one base scan each.

The probe grows the FACT side Nx, keeps the change window fixed
(1,000 appended facts + a 200-key delete), and times refresh(). The
honest expectation is sub-linear-but-not-flat (the view scan and one
base scan grow with N while the per-row maintenance work is fixed);
anything superlinear is a bug.

Usage: python tools/r11_octaves.py [--factor 8] [--out /tmp/r11_octave]
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
    ap.add_argument("--out", default="/tmp/r11_octave")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.matview import MaterializedJoinView
    from ent_fins_lakehouse_spark.sources.readers import load_table

    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out, exist_ok=True)
    orders = load_table(spark, args.sf, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load_table(spark, args.sf, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    n_base = orders.count()
    off = 1_000_000_000

    def tick(mult: int, name: str) -> float:
        a = DeltaLogTable(spark, os.path.join(args.out, f"a_{name}"))
        df = orders
        for i in range(1, mult):
            df = df.unionByName(
                orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * off))
            )
        a.write(df.repartition(32), mode="overwrite")
        a.set_property("delta.enableChangeDataFeed", "true")
        b = DeltaLogTable(spark, os.path.join(args.out, f"b_{name}"))
        b.write(cust.coalesce(2), mode="overwrite")
        b.set_property("delta.enableChangeDataFeed", "true")
        mv = MaterializedJoinView(spark, a, b, os.path.join(args.out, f"v_{name}"))
        mv.create(
            on=["custkey"], a_pk="o_orderkey", b_pk="custkey",
            a_cols=["o_totalprice"], b_cols=["c_mktsegment"],
        )
        # FIXED change window regardless of base size
        a.write(
            orders.limit(1000).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(50_000_000_000)
            ).coalesce(1),
            mode="append",
        )
        a.delete("o_orderkey >= 50000000000 AND o_orderkey % 5 = 0")
        t0 = time.perf_counter()
        out = mv.refresh()
        wall = time.perf_counter() - t0
        print(f"  {name}: base={n_base * mult} rows, refresh {wall:.2f}s {out}")
        # second window: delete a FIXED set of EXISTING keys (copy-0
        # only, so the same ~150 logical pks at every factor) — this
        # exercises the WHEN MATCHED DELETE's find-touched scan of the
        # VIEW, the part whose input grows with the view
        a.delete("o_orderkey < 4000")
        t0 = time.perf_counter()
        out2 = mv.refresh()
        wall2 = time.perf_counter() - t0
        print(f"  {name} (existing-key delete): refresh {wall2:.2f}s {out2}")
        return wall, wall2

    print("join-MV fixed-delta refresh tick:")
    tick(1, "warm")  # JVM/codegen warm-up
    t1, d1 = tick(1, "x1")
    tn, dn = tick(args.factor, f"x{args.factor}")
    print(
        f"\n| probe | 1x (s) | {args.factor}x (s) | ratio |\n|---|---|---|---|\n"
        f"| join-MV refresh (net-new window) | {t1:.2f} | {tn:.2f} | {tn / t1:.1f}x |\n"
        f"| join-MV refresh (existing-key delete) | {d1:.2f} | {dn:.2f} | {dn / d1:.1f}x |"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
