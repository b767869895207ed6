#!/usr/bin/env python
"""r9 octave probe: scale behavior of the round-9 features.

Measures, at 1x vs Nx replicated fixtures (scale_probe generator):
- Iceberg sort-order lifecycle (q330 shape): replace_sort_order is a
  metadata write (must be ~constant); the sorted compaction is one
  range-partitioned rewrite (should track data ~linearly); the probe
  scan's PRUNING FRACTION on the sort key must hold ~constant (the
  whole point of the feature — disjoint per-file bounds at any scale).
- Perceptual dHash dedup (q331 shape): hashing is one map-only pass
  (linear); the 4-band LSH join must stay candidate-bounded (the
  interleaved-salt generator keeps cross-copy texts dissimilar, so
  candidates grow with the PLANTED pairs, not quadratically).

Usage: python tools/r9_octaves.py [--factor 8] [--out /tmp/r9_octave]
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
    ap.add_argument("--out", default="/tmp/r9_octave")
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
    from ent_fins_lakehouse_spark.plans.llm_queries import q331_perceptual_hash_dedup
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.readers import load_table

    big = os.path.join(args.out, f"x{args.factor}")
    if not os.path.exists(os.path.join(big, "orders.parquet")):
        os.makedirs(big, exist_ok=True)
        replicate(spark, args.sf, big, args.factor, tables=["orders", "documents"])

    def timed(fn):
        t0 = time.time()
        r = fn()
        return time.time() - t0, r

    results = {}

    # ---- sort-order lifecycle: pruning fraction must hold at Nx ----
    for tag, sfd, nfiles in (("1x", args.sf, 8), (f"{args.factor}x", big, 8 * args.factor)):
        orders = load_table(spark, sfd, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        td = os.path.join(args.out, f"iso_{tag}")
        shutil.rmtree(td, ignore_errors=True)
        t = IcebergTable(spark, td)
        t.append(orders.repartition(nfiles))
        pred = "o_custkey BETWEEN 100 AND 200"
        before = t.scan_info(pred)
        mt, oid = timed(lambda: t.replace_sort_order(["o_custkey"]))
        ct, _ = timed(lambda: t.compact(target_files=nfiles))
        after = t.scan_info(pred)
        st, n = timed(lambda: t.read(where=pred).count())
        results[f"iso_meta_commit_s_{tag}"] = round(mt, 3)
        results[f"iso_compact_s_{tag}"] = round(ct, 2)
        results[f"iso_read_before_{tag}"] = f"{before['n_read']}/{before['n_active']}"
        results[f"iso_read_after_{tag}"] = f"{after['n_read']}/{after['n_active']}"
        results[f"iso_prune_frac_{tag}"] = round(after["n_pruned"] / after["n_active"], 3)
        results[f"iso_probe_s_{tag}"] = round(st, 2)
        assert after["n_read"] < before["n_read"]

    # ---- dHash dedup: map-only hash + banded LSH ----
    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        wt, n = timed(lambda: q331_perceptual_hash_dedup(spark, sfd).count())
        results[f"dhash_wall_s_{tag}"] = round(wt, 2)
        results[f"dhash_pairs_{tag}"] = n

    # ---- rewrite_position_deletes: O(delete bytes), data untouched ----
    # identical DML arc at both scales: the delete debt grows with SF
    # but stays KB-sized; the consolidation must track the DEBT, and
    # the data file set must be byte-identical across the rewrite
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        td = os.path.join(args.out, f"rpd_{tag}")
        shutil.rmtree(td, ignore_errors=True)
        t = IcebergTable(spark, td)
        t.append(
            load_table(spark, sfd, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .repartitionByRange(8, "o_custkey")
        )
        t.delete("o_orderkey % 10 = 3", mode="mor")
        t.delete("o_orderkey % 10 = 7", mode="mor")
        _, pos, _ = t._files()
        data_before = sorted(p for p, _, _ in t._files()[0])
        wt, res = timed(t.rewrite_position_deletes)
        assert sorted(p for p, _, _ in t._files()[0]) == data_before
        results[f"rpd_files_{tag}"] = f"{res['delete_files_before']}->{res['delete_files_after']}"
        results[f"rpd_rows_{tag}"] = res["rows_after"]
        results[f"rpd_wall_s_{tag}"] = round(wt, 2)

    # ---- v3 deletion vectors: write cost ~ deleted rows ----
    # the delete predicate matches an SF-proportional row set spread
    # over a FIXED number of files; the DV write must track the rows
    # (bitmap encode) plus fixed commit cost — never the table bytes
    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        td = os.path.join(args.out, f"dv_{tag}")
        shutil.rmtree(td, ignore_errors=True)
        t = IcebergTable(spark, td)
        t.append(
            load_table(spark, sfd, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .repartitionByRange(8, "o_custkey")
        )
        wt, res = timed(lambda: t.delete("o_orderkey % 10 = 3", mode="dv"))
        rt, n = timed(lambda: t.read().count())
        results[f"dv_delete_s_{tag}"] = round(wt, 2)
        results[f"dv_rows_deleted_{tag}"] = res["rows_deleted"]
        results[f"dv_masked_read_s_{tag}"] = round(rt, 2)

    # ---- materialized view: refresh cost ~ changes, not table ----
    # the SAME absolute change set (delete one group of ~1% of keys)
    # against a 1x and an Nx base: incremental refresh must stay
    # ~flat while the full recompute grows with the table
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.matview import MaterializedAggView

    for tag, sfd in (("1x", args.sf), (f"{args.factor}x", big)):
        orders = load_table(spark, sfd, "orders").select(
            "o_orderkey", (F.col("o_custkey") % 100).alias("g"), "o_totalprice"
        )
        bd = os.path.join(args.out, f"mvb_{tag}")
        vd = os.path.join(args.out, f"mvv_{tag}")
        shutil.rmtree(bd, ignore_errors=True)
        shutil.rmtree(vd, ignore_errors=True)
        base = DeltaLogTable(spark, bd)
        base.write(orders.repartition(32), mode="append")
        base.set_property("delta.enableChangeDataFeed", "true")
        mv = MaterializedAggView(spark, base, vd)
        ct, _ = timed(lambda: mv.create(["g"], ["o_totalprice"]))
        # fixed-size change: only keys < the 1x keyspace, group 7
        base.delete("g = 7 AND o_orderkey < 1500000")
        it, res = timed(mv.refresh)
        ft, _ = timed(lambda: mv.refresh(full=True))
        results[f"mv_create_s_{tag}"] = round(ct, 2)
        results[f"mv_incr_refresh_s_{tag}"] = round(it, 2)
        results[f"mv_full_refresh_s_{tag}"] = round(ft, 2)
        results[f"mv_groups_touched_{tag}"] = res["groups_touched"]

    import json

    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
