#!/usr/bin/env python
"""r9 session-3 octave probe: scale behavior of row lineage, default
values, and the geo cell join at 1x vs Nx replicated fixtures.

- Iceberg v3 row lineage (q346 shape): read_with_lineage() vs plain
  read() — the lineage resolution is a broadcast join against the
  KB-sized per-file dim + codegen coalesce, so the OVERHEAD RATIO must
  stay ~flat as data grows; the preserving compaction should track the
  data ~linearly (it is a rewrite).
- Iceberg v3 default values (q347 shape): a defaulted column over
  pre-evolution files — the per-file missing-dim fill must add ~flat
  relative cost to the scan.
- Geo cell join (q344 shape): customers replicated Nx against the
  FIXED supplier side — candidates are cell-equi-join bounded, so wall
  must track the probe side ~linearly (never quadratically).

Usage: python tools/r9s3_octaves.py [--factor 8] [--out /tmp/r9s3_octave]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/r9s3_octave")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.scale_probe import replicate

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.readers import load_table

    big = os.path.join(args.out, f"x{args.factor}")
    if not os.path.isdir(big):
        replicate(spark, args.sf, big, args.factor, tables=["customer", "orders"])
        for t in ("supplier",):
            load_table(spark, args.sf, t).write.mode("overwrite").parquet(
                os.path.join(big, f"{t}.parquet")
            )

    results: dict[str, dict] = {}

    # ---- row lineage: lineage read overhead + preserving compaction
    for label, sf_dir in (("1x", args.sf), (f"{args.factor}x", big)):
        path = os.path.join(args.out, f"lin_{label}")
        shutil.rmtree(path, ignore_errors=True)
        t = IcebergTable(spark, path)
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").cast("long").alias("k"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
        t.append(o.limit(0).coalesce(1))
        t.enable_row_lineage()
        t.append(o.repartition(16))
        t.delete("k % 10 = 3", mode="dv")
        warm = _noop(t.read())
        plain = min(_noop(t.read()) for _ in range(2))
        lin = min(_noop(t.read_with_lineage()) for _ in range(2))
        t0 = time.perf_counter()
        t.compact(target_files=16)
        compact_s = time.perf_counter() - t0
        lin2 = min(_noop(t.read_with_lineage()) for _ in range(2))
        results.setdefault("lineage", {})[label] = {
            "plain_read_s": round(plain, 3),
            "lineage_read_s": round(lin, 3),
            "overhead_ratio": round(lin / plain, 2),
            "compact_s": round(compact_s, 3),
            "post_compact_lineage_read_s": round(lin2, 3),
            "_warm": round(warm, 3),
        }

    # ---- default values: fill overhead over pre-evolution files
    for label, sf_dir in (("1x", args.sf), (f"{args.factor}x", big)):
        path = os.path.join(args.out, f"dflt_{label}")
        shutil.rmtree(path, ignore_errors=True)
        t = IcebergTable(spark, path)
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", F.col("c_acctbal").cast("double").alias("bal")
        )
        t.append(c.repartition(16))
        base = min(_noop(t.read()) for _ in range(2))
        t.add_column("tier", "string", default="standard")
        filled = min(_noop(t.read()) for _ in range(2))
        results.setdefault("defaults", {})[label] = {
            "pre_evolution_read_s": round(base, 3),
            "defaulted_read_s": round(filled, 3),
            "overhead_ratio": round(filled / base, 2),
        }

    # ---- geo cell join: probe side Nx, build side fixed
    from ent_fins_lakehouse_spark.plans.geo_queries import q344_geo_cell_distance_join

    for label, sf_dir in (("1x", args.sf), (f"{args.factor}x", big)):
        _noop(q344_geo_cell_distance_join(spark, sf_dir))  # warm
        w = min(_noop(q344_geo_cell_distance_join(spark, sf_dir)) for _ in range(2))
        n_pairs = (
            q344_geo_cell_distance_join(spark, sf_dir)
            .agg(F.sum("n_pairs"))
            .first()[0]
        )
        results.setdefault("geo_cell_join", {})[label] = {
            "wall_s": round(w, 3),
            "total_pairs": int(n_pairs),
        }

    import json

    print(json.dumps(results, indent=2))
    return 0


def binpack_probe() -> int:
    """Separate probe: binpack wall at 1x vs 8x BASE with FIXED debt —
    the claim is cost tracks the debt, so wall must be ~flat.
    Usage: python tools/r9s3_octaves.py --binpack [--factor 8]"""
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--binpack", action="store_true")
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/r9s3_octave")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.readers import load_table

    results: dict[str, dict] = {}
    base1 = load_table(spark, args.sf, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    for label, mult in (("1x", 1), (f"{args.factor}x", args.factor)):
        base = base1
        for i in range(1, mult):
            base = base.unionAll(
                base1.select((F.col("k") + F.lit(i * 10_000_000)).alias("k"), "v")
            )
        for fmt in ("delta", "iceberg"):
            path = os.path.join(args.out, f"bp_{fmt}_{label}")
            shutil.rmtree(path, ignore_errors=True)
            if fmt == "delta":
                t = DeltaLogTable(spark, path)
                t.write(base.repartition(8), mode="append")
                for i in range(6):  # FIXED debt, same at every base size
                    t.write(
                        base1.filter(f"k % 1000 = {i}").coalesce(1), mode="append"
                    )
                # fixed gate ABOVE the debt size, BELOW every base part:
                # the selection must be the 6 debt files at either scale
                gate = 100_000
                t0 = time.perf_counter()
                r = t.optimize(min_file_size_bytes=gate)
                w = time.perf_counter() - t0
            else:
                t = IcebergTable(spark, path)
                t.append(base.repartition(8))
                for i in range(6):
                    t.append(base1.filter(f"k % 1000 = {i}").coalesce(1))
                gate = 100_000
                t0 = time.perf_counter()
                r = t.rewrite_small_files(small_file_threshold_bytes=gate)
                w = time.perf_counter() - t0
            results.setdefault(fmt, {})[label] = {
                "binpack_wall_s": round(w, 3),
                "files_selected": r["files_selected"],
            }
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(binpack_probe() if "--binpack" in sys.argv else main())
