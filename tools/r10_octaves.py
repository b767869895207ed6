#!/usr/bin/env python
"""r10 octave probe: scale behavior of the round's new change-data
machinery at 1x vs Nx base-table size with a FIXED-size change.

- DV CDC (q367 shape): a deletion-vector delete of a FIXED number of
  rows on a growing table, then `read_changes` over just that
  snapshot. The feed cost must track the CHANGE (delta bitmap decode +
  re-read of the referenced files' masked positions), never the table.
- Streaming-MV tick (q366 shape): a FIXED-size append into a growing
  Iceberg base, one incremental refresh. The tick must stay
  O(changed rows) + O(touched groups) however large the base is.

Usage: python tools/r10_octaves.py [--factor 8] [--out /tmp/r10_octave]
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
    ap.add_argument("--out", default="/tmp/r10_octave")
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

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.matview import MaterializedAggView
    from ent_fins_lakehouse_spark.sources.readers import load_table

    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out, exist_ok=True)
    orders = load_table(spark, args.sf, "orders").select(
        "o_orderkey", (F.col("o_custkey") % 64).alias("g"), "o_totalprice"
    )
    n_base = orders.count()

    def build(mult: int, name: str) -> IcebergTable:
        t = IcebergTable(spark, os.path.join(args.out, name))
        df = orders
        for i in range(1, mult):
            df = df.unionAll(
                orders.select(
                    (F.col("o_orderkey") + F.lit(i * 100_000_000)).alias("o_orderkey"),
                    "g",
                    "o_totalprice",
                )
            )
        t.append(df.repartition(8 * mult))
        return t

    results: dict[str, dict] = {}
    for mult in (1, args.factor):
        tag = f"{mult}x"
        t = build(mult, f"dvcdc_{tag}")
        base_snap = t.metadata()["current-snapshot-id"]
        # FIXED-size change: ~2k rows whatever the table size
        t0 = time.perf_counter()
        st = t.delete("o_orderkey % 7919 = 3", mode="dv")
        dv_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_feed = t.read_changes(base_snap).count()
        feed_wall = time.perf_counter() - t0
        results.setdefault("dv_cdc", {})[tag] = {
            "table_rows": n_base * mult,
            "rows_deleted": st["rows_deleted"],
            "feed_rows": n_feed,
            "dv_write_s": round(dv_write, 3),
            "feed_wall_s": round(feed_wall, 3),
        }

        # streaming-MV tick: base seeded at mult x, then one FIXED tick
        b = DeltaLogTable(spark, os.path.join(args.out, f"mvb_{tag}"))
        seed = orders
        for i in range(1, mult):
            seed = seed.unionAll(
                orders.select(
                    (F.col("o_orderkey") + F.lit(i * 100_000_000)).alias("o_orderkey"),
                    "g",
                    "o_totalprice",
                )
            )
        b.write(seed.repartition(8 * mult), mode="append")
        b.set_property("delta.enableChangeDataFeed", "true")
        mv = MaterializedAggView(spark, b, os.path.join(args.out, f"mvv_{tag}"))
        mv.create(["g"], ["o_totalprice"])
        tick = orders.filter(F.col("o_orderkey") % 100 == 1).select(
            (F.col("o_orderkey") + F.lit(900_000_000)).alias("o_orderkey"),
            "g",
            "o_totalprice",
        )
        b.write(tick.coalesce(1), mode="append")
        t0 = time.perf_counter()
        st2 = mv.refresh()
        tick_wall = time.perf_counter() - t0
        results.setdefault("mv_tick", {})[tag] = {
            "base_rows": n_base * mult,
            "tick_rows": tick.count(),
            "groups_touched": st2.get("groups_touched"),
            "tick_wall_s": round(tick_wall, 3),
        }

    import json

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
