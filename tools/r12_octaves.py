#!/usr/bin/env python
"""r12 octave probe: join-view maintenance at 1x vs Nx base size with
a FIXED-size change window — r11_octaves' successor, now over the
CLUSTERED view layout (VERDICT r11 item 2).

What changed since r11: MaterializedJoinView.create declares
clustering on the a-side pk and (past CLUSTER_REWRITE_MIN_BYTES)
physically clusters the view via OPTIMIZE, and DeltaLogTable.merge
prunes its find-touched scan with merge-key data skipping (file-stats
[min,max] vs the source key range, past MERGE_PRUNE_MIN_BYTES). The
r11 finding was that the existing-key-delete tick grew 1.6x at 8x
because the WHEN MATCHED DELETE merge scanned the whole view; with
the clustered layout + pruning the tick should be FLAT (<= 1.1x).

The probe grows the FACT side Nx, keeps the change window fixed
(1,000 appended facts + a 200-key delete), and times refresh() for
two windows:
- net-new keys (append + delete of the new keys) — r11c's first probe;
- a FIXED set of EXISTING keys (copy-0 only) — the view-scan probe.

Exits nonzero if the existing-key-delete ratio exceeds 1.1x.

Usage: python tools/r12_octaves.py [--factor 8] [--out /tmp/r12_octave]
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
    ap.add_argument("--out", default="/tmp/r12_octave")
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

    def tick(mult: int, name: str) -> tuple[float, float]:
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
        # only, so the same ~150 logical pks at every factor) — the
        # probe that caught the r11 view-scan growth
        a.delete("o_orderkey < 4000")
        t0 = time.perf_counter()
        out2 = mv.refresh()
        wall2 = time.perf_counter() - t0
        print(f"  {name} (existing-key delete): refresh {wall2:.2f}s {out2}")
        return wall, wall2

    print("join-MV fixed-delta refresh tick (clustered layout):")
    tick(1, "warm")  # JVM/codegen warm-up
    t1, d1 = tick(1, "x1")
    tn, dn = tick(args.factor, f"x{args.factor}")
    ratio_net = tn / t1
    ratio_del = dn / d1
    print(
        f"\n| probe | 1x (s) | {args.factor}x (s) | ratio |\n|---|---|---|---|\n"
        f"| join-MV refresh (net-new window) | {t1:.2f} | {tn:.2f} | {ratio_net:.2f}x |\n"
        f"| join-MV refresh (existing-key delete) | {d1:.2f} | {dn:.2f} | {ratio_del:.2f}x |"
    )
    if ratio_del > 1.1:
        print(f"FAIL: existing-key-delete tick not flat ({ratio_del:.2f}x > 1.1x)")
        return 1
    print("PASS: existing-key-delete tick flat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
