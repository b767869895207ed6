#!/usr/bin/env python
"""Scale-up probe: replicate sf0.1 Nx with shifted keys, rerun the
headline queries, and report 1x vs Nx wall-clock ratios.

This is the committed generator behind SCALING.md. Replication
preserves each table's join structure and statistical shape while
keeping copies disjoint, so work should scale ~linearly and anything
superlinear is a real algorithmic smell:

- fact/dim keys are offset per copy (joins stay within-copy; nation/
  region stay single-copy like real slowly-growing dims)
- documents get ~15%% extra per-copy salt tokens so cross-copy Jaccard
  lands below the 0.9 near-dup threshold (no artificial cross-copy
  cliques; within-copy near-dup structure intact)
- embeddings are cyclically rotated by copy index (within-copy cosines
  exactly preserved; cross-copy pairs decorrelated)

Usage:
    python tools/scale_probe.py [--factor 8] [--out /tmp/scale_probe]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 100_000_000

PROBE_QUERIES = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_regional_revenue",
    "q17_window_topk",
    "q23_events_hourly",
    "q24_sessionize",
    "q26_asof_join",
    "q27_range_join",
    "q38_bilateral_volume",
    "q40_stream_file_ingest",
    "q49_exact_percentiles",
    "q50_exact_dedup",
    "q52_jaccard_near_dup",
    "q53_minhash_lsh_dedup",
    "q58_cosine_topk",
    "q63_embedding_near_dup",
    "q64_token_frequencies",
    "q66_tfidf_top_terms",
    "q68_corpus_cleaning_pipeline",
    "q77_stream_upsert_cdc",
    "q82_small_qty_revenue",
    "q85_customer_order_distribution",
    "q86_large_volume_customers",
    "q87_returned_item_revenue",
    "q88_nation_market_share",
    "q140_incremental_rollup",
    "q173_scd2_dimension",
    "q174_bm25_topk",
    "q178_pagerank",
    "q175_span_dedup_stats",
    "q178_pagerank",
    # r6 session: ingest + tokenizer + curation + streaming sketch
    "q219_copy_into",
    "q222_bpe_pair_stats",
    "q225_type_token_stats",
    "q227_incremental_dedup_index",
    "q228_stream_heavy_hitters",
    "q229_bpe_train",
    "q232_curriculum_schedule",
    # r8 session 2: CDF DML, graph BFS, survival, basket, islands, median
    "q302_delta_cdf_dml",
    "q303_bfs_shortest_path",
    "q304_kaplan_meier",
    "q305_market_basket_lift",
    "q306_gaps_and_islands",
    "q307_weighted_median",
    # r8 session 2b: stats/attribution/segmentation + lakehouse DML paths
    "q309_ks_two_sample",
    "q310_time_decay_attribution",
    "q311_rfm_segmentation",
    "q312_scd2_point_in_time_join",
    "q313_iceberg_ndv_statistics",
    "q314_zipf_law_fit",
    "q315_iceberg_cow_over_eq_deletes",
    "q316_delta_dml_on_mapped_table",
    "q317_iceberg_eq_delete_changes",
    "q318_cumulative_distinct_users",
    "q319_revenue_bridge",
    "q320_delta_timestamp_ntz",
    "q321_multiset_set_ops",
    "q322_modern_aggregates",
    "q323_percent_of_parent_rollup",
    "q324_dau_mau_stickiness",
    # r11: duplicated spans (all-position gram join), A-ES sample,
    # gap-fill interpolation, record linkage, session pattern match
    "q373_duplicated_spans",
    "q375_weighted_reservoir_sample",
    "q376_gap_fill_interpolate",
    "q377_record_linkage",
    "q379_session_pattern_match",
]

# per-table key columns to offset per copy (fact->dim links stay valid
# because both sides get the same offset)
OFFSETS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["nation", "region"]


def replicate(spark, src_dir: str, out_dir: str, factor: int, tables: list[str] | None = None) -> None:
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.sources.readers import load_table

    for t in SINGLE_COPY:
        if tables and t not in tables:
            continue
        load_table(spark, src_dir, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    for t, keys in OFFSETS.items():
        if tables and t not in tables:
            continue
        base = load_table(spark, src_dir, t)
        copies = []
        for i in range(factor):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            if t == "documents":
                # Interleave a per-copy salt token after every 6th word
                # (NOT appended at the end: appended salt leaves all
                # original word n-grams shared, and cross-copy 3-gram
                # Jaccard ~0.73 is inside the LSH banding knee — at
                # large factors every cross-copy pair becomes a
                # candidate and candidate count grows quadratically in
                # the factor, a generator artifact rather than an
                # operator property). Interleaving destroys the shared
                # n-grams spanning salt positions: cross-copy 3-gram
                # J ~ 0.27 → candidate probability ~1e-4. Within-copy
                # pairs get identical salt at identical positions, so
                # within-copy near-dup structure is preserved.
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.flatten(
                            F.zip_with(
                                F.split(F.col("text"), " "),
                                F.sequence(F.lit(0), F.size(F.split(F.col("text"), " ")) - 1),
                                lambda w, j: F.when(
                                    j % 6 == 5,
                                    F.array(w, F.concat(F.lit(f"zcopy{i}tok"), (j / 6).cast("int").cast("string"))),
                                ).otherwise(F.array(w)),
                            )
                        ),
                        " ",
                    ),
                )
            if t == "embeddings":
                # cyclic rotation by i: within-copy cosines unchanged,
                # cross-copy pairs decorrelated
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {i} + 1, size(embedding) - {i}), "
                        f"slice(embedding, 1, {i}))"
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        npart = max(factor, spark.sparkContext.defaultParallelism)
        out.repartition(npart).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )


def time_queries(spark, qmap, sf_dir: str) -> dict[str, float]:
    from ent_fins_lakehouse_spark.operators.blocking import BlockSizeExceededError

    out = {}
    for name in PROBE_QUERIES:
        t0 = time.perf_counter()
        try:
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except BlockSizeExceededError:
            # the exact-pair census guard refused the workload — at large
            # factors this is the bounded-block contract working as
            # designed (route to LSH/IVF), not a probe failure
            out[name] = float("nan")
            continue
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def interop_probe(spark, sf_dir: str, scratch: str, n_files: int = 32) -> dict[str, float]:
    """Octave-probe the lakehouse interop paths (r5 verdict item 7):
    commit-protocol + DV-decode + manifest costs measured, not assumed.

    Builds, from the (possibly replicated) ``orders`` table:

    - a public-format Delta table written across ``n_files`` files,
      then DV-DELETEs every 3rd order (RoaringBitmap sidecars over
      ~N/3 row indexes — the exact path that was driver-isin before
      round 6), then times a full read (log replay + executor-side DV
      decode + anti-join) and a selective predicate read (add-action
      min/max file skipping);
    - an Iceberg v2 table via ``append`` (footer-sourced manifests),
      then times a full read (Avro manifest decode) and a selective
      predicate read (manifest lower/upper-bound skipping).

    Timings include the table build because commit-protocol cost IS
    part of the operation at scale; read timings are noop-sunk so they
    measure plan execution, not collect.
    """
    import shutil

    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.readers import load_table

    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    # range-partitioned by key: files carry disjoint [min,max] ranges,
    # so add-action/manifest-bound skipping has something to skip — a
    # round-robin write gives every file the full key range and the
    # predicate probe degenerates to "0 files skipped" by construction
    orders_ranged = orders.repartitionByRange(n_files, "o_orderkey")
    lo = orders.agg({"o_orderkey": "min"}).collect()[0][0]
    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 2)
        return r

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    dpath = os.path.join(scratch, "delta_dv")
    dl = DeltaLogTable(spark, dpath)
    timed("delta_write", lambda: dl.write(orders_ranged, mode="append"))
    timed("delta_dv_delete", lambda: dl.delete("o_orderkey % 3 = 0"))
    timed("delta_dv_read", lambda: sink(dl.read()))
    timed(
        "delta_pred_read",
        lambda: sink(dl.read(where=f"o_orderkey <= {lo + 100}")),
    )
    si = dl.scan_info(where=f"o_orderkey <= {lo + 100}")
    out["delta_files_skipped"] = si["n_pruned"]

    ipath = os.path.join(scratch, "iceberg")
    it = IcebergTable(spark, ipath)
    timed("iceberg_append", lambda: it.append(orders_ranged))
    timed("iceberg_read", lambda: sink(it.read()))
    timed(
        "iceberg_pred_read",
        lambda: sink(it.read(where=f"o_orderkey <= {lo + 100}")),
    )

    # merge-on-read DML (r6): position-delete staging + data manifest
    # in one snapshot. The change feed is ~1% of the table — the cost
    # that must track the CHANGE size, not the table size.
    from pyspark.sql import functions as F

    hi = orders.agg({"o_orderkey": "max"}).collect()[0][0]
    upd = orders.filter(F.col("o_orderkey") % 100 == 1).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    ins = upd.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(hi))
    timed(
        "iceberg_mor_update",
        lambda: it.update({"o_totalprice": "o_totalprice + 1.0"}, "o_orderkey % 100 = 7"),
    )
    timed("iceberg_merge", lambda: it.merge(upd.unionByName(ins), on=["o_orderkey"]))
    timed("iceberg_mor_read", lambda: sink(it.read()))

    # r6 additions: equality-delete CDC (write cost must track the
    # BATCH, not the table), bucket[16] point lookups, day(ts) window
    # scans, and column-mapped appends after a metadata-only rename
    cdc = orders.filter(F.col("o_orderkey") % 100 == 3).withColumn(
        "o_totalprice", F.col("o_totalprice") + 2.0
    )
    timed("iceberg_eq_upsert", lambda: it.upsert_eq(cdc, keys=["o_orderkey"]))
    timed("iceberg_eq_read", lambda: sink(it.read()))

    bt = IcebergTable(spark, os.path.join(scratch, "iceberg_bucket"))
    timed(
        "iceberg_bucket_append",
        lambda: bt.append(orders_ranged, partition_by=["bucket(16, o_orderkey)"]),
    )
    timed(
        "iceberg_bucket_lookup",
        lambda: sink(bt.read(where=f"o_orderkey = {lo + 40}")),
    )
    out["bucket_files_read"] = bt.scan_info(f"o_orderkey = {lo + 40}")["n_read"]

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    dt_ = IcebergTable(spark, os.path.join(scratch, "iceberg_day"))
    timed(
        "iceberg_day_append",
        lambda: dt_.append(ev.repartition(n_files), partition_by=["day(ts)"]),
    )
    timed(
        "iceberg_day_window",
        lambda: sink(
            dt_.read(
                where="ts >= '2024-01-10 00:00:00' AND ts < '2024-01-17 00:00:00'"
            )
        ),
    )

    timed("delta_rename_metadata_only", lambda: dl.rename_column("o_orderstatus", "status"))
    timed(
        "delta_mapped_append",
        lambda: dl.write(
            orders_ranged.withColumnRenamed("o_orderstatus", "status"), mode="append"
        ),
    )

    # r7: Iceberg copy-on-write DML + rewrite_manifests — after CoW
    # replaces the files a position delete pointed at and the dangling
    # delete manifests are dropped, the read must return to a plain
    # scan (flat vs the pre-DML read)
    ct = IcebergTable(spark, os.path.join(scratch, "iceberg_cow"))
    timed("cow_append", lambda: ct.append(orders_ranged))
    timed("cow_mor_delete", lambda: ct.delete("o_orderkey % 10 = 3"))
    timed("cow_read_with_deletes", lambda: sink(ct.read()))
    timed(
        "cow_update",
        lambda: ct.update(
            {"o_totalprice": "o_totalprice + 1.0"},
            "o_orderkey % 2 = 0",
            mode="cow",
        ),
    )
    timed("cow_rewrite_manifests", lambda: ct.rewrite_manifests())
    timed("cow_read_after_rewrite", lambda: sink(ct.read()))

    # r7: bloom file-index build + point probe on a hash-shuffled layout
    # (range stats prune nothing by construction — the needle path the
    # index exists for). Build must track data size; probe cost must
    # track the DESCRIPTOR table (KB/file), not the data.
    bl = DeltaLogTable(spark, os.path.join(scratch, "delta_bloom"))
    timed(
        "bloom_write",
        lambda: bl.write(
            orders.repartition(n_files, F.md5(F.col("o_orderkey").cast("string"))),
            mode="append",
        ),
    )
    out["bloom_prune_pre"] = bl.scan_info(f"o_orderkey = {lo + 40}")["n_pruned"]
    timed("bloom_build", lambda: bl.create_bloom_index("o_orderkey"))
    timed(
        "bloom_probe_cold",
        lambda: sink(bl.read(where=f"o_orderkey = {lo + 40}")),
    )
    out["bloom_files_read"] = bl.scan_info(f"o_orderkey = {lo + 40}")["n_read"]
    timed(
        "bloom_probe_warm",
        lambda: sink(bl.read(where=f"o_orderkey = {lo + 40}")),
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--interop",
        action="store_true",
        help="probe the Delta-DV / Iceberg interop paths instead of the query set",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the probe queries (default: all)",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to replicate (default: all; "
        "use with --queries to keep single-family probes cheap)",
    )
    args = ap.parse_args()
    if args.queries:
        subset = args.queries.split(",")
        unknown = set(subset) - set(PROBE_QUERIES)
        if unknown:
            ap.error(f"unknown probe queries: {sorted(unknown)}")
        PROBE_QUERIES[:] = subset

    from ent_fins_lakehouse_spark.plans.registry import queries_map
    from ent_fins_lakehouse_spark.session import get_session

    spark = get_session(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = queries_map()

    big = os.path.join(args.out, f"x{args.factor}")
    if not args.skip_gen:
        print(f"replicating {args.src} -> {big} ({args.factor}x)", flush=True)
        replicate(
            spark, args.src, big, args.factor,
            tables=args.tables.split(",") if args.tables else None,
        )

    if args.interop:
        # warm pass at the smallest SF: JVM/codegen/Arrow spin-up and
        # first-parquet-reader init amortize here, not in the 1x column
        interop_probe(spark, "/root/testdata/sf0.001", os.path.join(args.out, "interop_warm"))
        t1 = interop_probe(spark, args.src, os.path.join(args.out, "interop_1x"))
        tn = interop_probe(spark, big, os.path.join(args.out, f"interop_{args.factor}x"))
        print(f"\n| interop op | 1x (s) | {args.factor}x (s) | ratio |")
        print("|---|---|---|---|")
        for name in t1:
            if name.endswith(("_skipped", "_files_read", "_prune_pre")):
                print(f"| {name} | {t1[name]} | {tn[name]} | n/a |")
                continue
            r = tn[name] / t1[name] if t1[name] else float("inf")
            print(f"| {name} | {t1[name]:.2f} | {tn[name]:.2f} | {r:.1f}x |")
        return 0

    # warm pass at the small SF (codegen + worker spin-up amortized, as
    # on any long-lived cluster), then timed 1x and Nx passes
    for name in PROBE_QUERIES:
        qmap[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    t1 = time_queries(spark, qmap, args.src)
    tn = time_queries(spark, qmap, big)

    import math

    print(f"\n| query | 1x (s) | {args.factor}x (s) | ratio |")
    print("|---|---|---|---|")
    def fmt(t: float) -> str:
        return "guard-refused" if math.isnan(t) else f"{t:.2f}"

    for name in PROBE_QUERIES:
        if math.isnan(t1[name]) or math.isnan(tn[name]):
            print(f"| {name} | {fmt(t1[name])} | {fmt(tn[name])} | n/a |")
            continue
        r = tn[name] / t1[name] if t1[name] else float("inf")
        print(f"| {name} | {t1[name]:.2f} | {tn[name]:.2f} | {r:.1f}x |")
    # a query is "ran" only if BOTH passes finished — a guard refusal at
    # the 1x baseline must not poison the worst-ratio max() with NaN
    ran = [
        n for n in PROBE_QUERIES if not (math.isnan(t1[n]) or math.isnan(tn[n]))
    ]
    if ran:
        worst = max(ran, key=lambda n: tn[n] / max(t1[n], 1e-9))
        print(
            f"\nworst ratio: {worst} "
            f"{tn[worst] / max(t1[worst], 1e-9):.1f}x on {args.factor}x data"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
