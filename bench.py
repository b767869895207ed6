#!/usr/bin/env python
"""Headline benchmark — one JSON line for the driver.

Runs a representative subset of the engine's named queries (relational
scan/agg, multi-join, window, event-time, dedup, similarity) at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints::

    {"metric": "headline_wall", "value": <total sec>, "unit": "sec",
     "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

Each query is fully materialized through the ``noop`` datasource writer
(runs the whole plan on executors, no driver collect, no sink I/O), so
the timing measures scan→shuffle→agg work, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Queries chosen to cover every physical shape that matters at scale:
# columnar scan + partial/final agg, broadcast + shuffle joins,
# window functions, event-time bucketing, hash dedup, LSH banding,
# and vectorized embedding math.
HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_regional_revenue",
    "q09_semi_join",
    "q12_broadcast_dim_join",
    "q17_window_topk",
    "q23_events_hourly",
    "q24_sessionize",
    "q26_asof_join",
    "q27_range_join",
    "q36_complex_predicate_revenue",
    "q38_bilateral_volume",
    "q49_exact_percentiles",
    "q82_small_qty_revenue",
    "q85_customer_order_distribution",
    "q86_large_volume_customers",
    "q87_returned_item_revenue",
    "q88_nation_market_share",
    "q97_stat_functions",
    "q101_sole_late_supplier",
    "q109_sql_cte_ranking",
    "q50_exact_dedup",
    "q52_jaccard_near_dup",
    "q53_minhash_lsh_dedup",
    "q58_cosine_topk",
    "q63_embedding_near_dup",
    "q64_token_frequencies",
    "q66_tfidf_top_terms",
    "q138_quantized_ann",
    "q139_unigram_lm_quality",
    "q158_per_source_cap",
    "q159_sequence_packing",
    "q160_bigram_lm_quality",
    # lakehouse interop verbs (write path + DML + CDF), tracked
    # round-over-round like the relational/LLM sets — the timing
    # includes the table build because commit-protocol cost IS the
    # operation's cost at scale
    "q145_delta_log_write",
    "q156_lake_update",
    "q161_delta_change_feed",
    "q165_delta_log_merge",
    # retrieval + sub-document dedup (r6)
    "q174_bm25_topk",
    "q175_span_dedup_stats",
    # Iceberg merge-on-read DML + DSIR selection (r6)
    "q190_iceberg_merge",
    "q192_dsir_selection",
    # linear-pass curation/augmentation ops (r6 session)
    "q196_classifier_quality_gate",
    "q199_passage_chunking",
    "q203_fim_transform",
    "q204_mlm_masking",
    # idempotent ingest + tokenizer/dedup curation (r6 session)
    "q219_copy_into",
    "q222_bpe_pair_stats",
    "q227_incremental_dedup_index",
    # retrieval/serving tier (r7, VERDICT r6 item 8): PQ encode+probe
    # and the bloom file-index needle path, tracked round-over-round
    "q176_pq_ann",
    "q215_bloom_file_index",
    # r7 lakehouse write paths (VERDICT r7 item 8): Iceberg
    # copy-on-write DML and the Delta V2 checkpoint write+bootstrap
    "q253_iceberg_copy_on_write",
    "q254_delta_v2_checkpoint_write",
    # r8 maintenance + quality additions: surgical DV purge,
    # Hilbert clustering (write-path curve cost tracked vs q180's
    # Z-order), and the entropy quality gate's explode+agg pass
    "q292_delta_reorg_purge",
    "q294_delta_hilbert_clustering",
    "q291_unigram_entropy_quality",
    # r8 session 2: CDF emission (DML write path incl. cdc staging),
    # iterative BFS over a real edge table, within-basket self-join
    "q302_delta_cdf_dml",
    "q303_bfs_shortest_path",
    "q305_market_basket_lift",
    # r9: Iceberg sort-order lifecycle (metadata commit + stamped
    # append + range-disjoint rewrite) and the perceptual-hash
    # multimodal dedup (block-mean dHash + 4-band LSH)
    "q330_iceberg_sort_order",
    "q331_perceptual_hash_dedup",
    # r9 session 2: the UniForm interop pair — per-commit Iceberg twin
    # maintenance and the reverse (Iceberg→Delta) incremental sync
    "q339_delta_uniform_auto_sync",
    "q341_iceberg_to_delta_sync",
    # r9 session 3: geo cell-blocked distance join (broadcast equi-join
    # on grid cells), Iceberg v3 row lineage (id-carrying lifecycle:
    # appends + DV delete + preserving compaction) and default values
    # (metadata-only backfill + CoW delete through the default), and
    # the dense-spine seasonal decomposition
    "q344_geo_cell_distance_join",
    "q346_iceberg_row_lineage",
    "q347_iceberg_default_values",
    "q348_seasonal_decomposition",
    # r9 session 3b: selective bin-pack on both formats (cost tracks
    # the small-file debt — the streaming-ingest housekeeping verb)
    "q354_binpack_compaction",
    # r10: the Iceberg change-feed stream driving the live MV (the
    # cross-format DLT shape; wall is the streaming fixture arc), and
    # the Iceberg Z-order rewrite (write-path curve cost, the
    # cross-format pair of q294's Delta Hilbert row)
    "q366_iceberg_streaming_mv",
    "q371_iceberg_zorder_rewrite",
    # r11: duplicated-span extraction (all-position gram join + window
    # runs — the heaviest new scan shape), the delta-rule join MV and
    # its streaming twin (commit-protocol lifecycles), and three light
    # linear-pass rows (A-ES sample, gap-fill interpolation, session
    # pattern match, FS record linkage)
    "q373_duplicated_spans",
    "q374_join_mv_incremental",
    "q375_weighted_reservoir_sample",
    "q376_gap_fill_interpolate",
    "q377_record_linkage",
    "q378_streaming_join_mv",
    "q379_session_pattern_match",
    # r12: WITH RECURSIVE lowered through the SQL facade (fixture
    # build + depth-bounded fixpoint loop) and the equality-delete
    # CDC stream (two availableNow drains over upsert_eq/delete_eq
    # snapshots) — both lifecycle rows
    "q382_recursive_cte_sql",
    "q383_iceberg_eq_delete_stream",
    # r12 session 2: the near-dup TVF (fixture build + prefix join
    # through the SQL facade — lifecycle) and the batched IVF mining
    # probe (pruned scan + broadcast join + window — scan-shaped)
    "q384_near_dup_tvf_sql",
    "q385_ivf_batch_mining",
    # r13: the LSH pipeline alone (q53 times LSH + exact ground truth
    # in one number; this row isolates the banding/verify wall)
    "q386_minhash_lsh_pairs",
]

# Headline rows whose wall is dominated by table BUILDS + commit
# protocol (fixture write -> DML -> maintenance verb), not by scans.
# Tracked separately (VERDICT r9 item 10): suite growth keeps adding
# lifecycle rows whose fixed commit cost would otherwise bury scan-plan
# drift — the 2x-vs-baseline budget's real subject — in the total.
LIFECYCLE = {
    "q145_delta_log_write",
    "q156_lake_update",
    "q161_delta_change_feed",
    "q165_delta_log_merge",
    "q190_iceberg_merge",
    "q215_bloom_file_index",
    "q219_copy_into",
    "q227_incremental_dedup_index",
    "q253_iceberg_copy_on_write",
    "q254_delta_v2_checkpoint_write",
    "q292_delta_reorg_purge",
    "q294_delta_hilbert_clustering",
    "q302_delta_cdf_dml",
    "q330_iceberg_sort_order",
    "q339_delta_uniform_auto_sync",
    "q341_iceberg_to_delta_sync",
    "q346_iceberg_row_lineage",
    "q347_iceberg_default_values",
    "q354_binpack_compaction",
    "q366_iceberg_streaming_mv",
    "q371_iceberg_zorder_rewrite",
    "q374_join_mv_incremental",
    "q378_streaming_join_mv",
    "q382_recursive_cte_sql",
    "q383_iceberg_eq_delete_stream",
    "q384_near_dup_tvf_sql",
}


def _summary_path(
    contended: bool,
    root: str,
    new_queries: dict | None = None,
    cpus: int | None = None,
) -> str:
    """Where this run's summary lands. A contended run never clobbers
    an existing solo (contended: false) record — it diverts to the
    gitignored bench_summary.contended.json so the committed record and
    `git status` stay clean across driver rounds (VERDICT r11 item 3).

    Second line of defense (VERDICT r13 item 1, after a loadavg-2.0
    capture slipped the old strict-> boundary and clobbered the r13
    solo record): even when loadavg looks clean, refuse to overwrite a
    solo record with a capture whose common-row timing sum is >10%
    SLOWER — contention is the only force that uniformly inflates, so
    inflation past the noise band diverts + warns, while a faster
    capture is a better solo record and replaces it."""
    path = os.path.join(root, "bench_summary.json")
    divert = os.path.join(root, "bench_summary.contended.json")
    try:
        with open(path) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return path
    if rec.get("contended") is not False:
        return path
    if contended:
        return divert
    # Third line of defense (r15, after the 8-core scaling probe's
    # summary slipped the 1.10 sum guard and clobbered a minutes-old
    # 32-core record): a capture at a DIFFERENT core count than the
    # record's is a scaling probe, not a better solo record — divert.
    # Records predating the cpus field (no "cpus" key) only accept
    # same-count overwrites once a cpus-stamped run lands.
    if (
        cpus is not None
        and rec.get("cpus") is not None
        and int(rec["cpus"]) != int(cpus)
    ):
        print(
            f"bench: capture at {cpus} cores vs the committed "
            f"{rec['cpus']}-core solo record — scaling probe, "
            f"diverting to {divert}.",
            file=sys.stderr,
        )
        return divert
    old_q = rec.get("queries") or {}
    common = set(old_q) & set(new_queries or {})
    old_sum = sum(old_q[q] for q in common)
    new_sum = sum(new_queries[q] for q in common)
    if common and old_sum > 0 and new_sum > 1.10 * old_sum:
        print(
            f"bench: common-row sum {new_sum:.1f}s is "
            f"{new_sum / old_sum:.2f}x the committed solo record "
            f"({old_sum:.1f}s) — treating as undetected contention; "
            "diverting. If the slowdown is a real plan change, move "
            f"{divert} over bench_summary.json by hand.",
            file=sys.stderr,
        )
        return divert
    return path


def _is_contended(loadavg_start: float | None) -> bool:
    """>= and a 1.0 threshold (VERDICT r13 item 1): the r13 record was
    clobbered by a capture at loadavg_start exactly 2.0 (the old
    strict-> test kept it "solo"); this host idles at ~0.0x, so any
    sustained 1.0+ at launch is foreign load, and the r13 evidence
    (2.0 -> 1.13x inflation) shows the old 2.0 bar was itself too
    permissive."""
    return loadavg_start is not None and loadavg_start >= 1.0


def _loadavg() -> float | None:
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:
        return None


def _engine_versions() -> dict[str, str]:
    """Pin the environment contract in the artifact (VERDICT r10 item
    7): the r10 driver-red class came from engine-BRIDGE behavior
    (duckdb 1.0.0 pandas HUGEINT handling), so a driver-side version
    bump must be diagnosable from the artifact alone."""
    import platform

    import duckdb
    import numpy
    import pandas
    import pyarrow
    import pyspark

    return {
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "pandas": pandas.__version__,
        "pyarrow": pyarrow.__version__,
        "numpy": numpy.__version__,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Contention guard (VERDICT r10 item 3): the committed r10 record
    # was captured at loadavg 10.04 and read 1.20x vs r9 on pure host
    # contention (the solo rerun read 0.99x). Stamp the start loadavg
    # and a contended flag so a noisy capture can never masquerade as
    # a plan regression; the flag is a record, not a refusal, because
    # the external driver's run must still produce an artifact.
    loadavg_start = _loadavg()
    contended = _is_contended(loadavg_start)
    if contended:
        print(
            f"WARNING: start loadavg {loadavg_start} > 2 — timings will be "
            "contention-inflated; rerun solo for the record",
            file=sys.stderr,
        )
    # debugging hook (unset in driver runs): restrict the headline to a
    # comma-separated subset — used to A/B the warmup-size hypothesis
    # when attributing round-over-round drift (VERDICT r6 item 2)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        subset = [q for q in only.split(",") if q]
        unknown = set(subset) - set(HEADLINE)
        if unknown:
            raise SystemExit(f"unknown bench queries: {sorted(unknown)}")
        HEADLINE[:] = subset
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from ent_fins_lakehouse_spark.session import DEFAULT_CPUS, get_session
    from ent_fins_lakehouse_spark.plans.registry import queries_map

    spark = get_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qmap = queries_map()
    # Warm-run benchmarking: execute every headline query once at the
    # smallest scale factor first, so the timed pass measures the
    # engine (scan → shuffle → agg), not one-time JVM/codegen compile,
    # parquet-reader init, and Python/Arrow worker spin-up. q53 cold is
    # 8.5 s vs 1.6 s warm from worker startup alone; on a real cluster
    # these costs amortize across a session, so steady state is the
    # honest per-query number.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                qmap[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass  # warmup is best-effort; the timed pass will surface real failures
    else:
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Timed pass: min of two runs per query. The VM this runs on shows
    # >2x run-to-run noise from host contention; min-of-N reports the
    # engine's cost rather than the host's worst moment. The cache is
    # cleared between runs so a query that persists an intermediate
    # (LSH shingles, norm vectors) re-computes it every run — both
    # runs are cold-cache, warm-JVM.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qmap[name]
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    scan_wall = round(sum(t for q, t in timings.items() if q not in LIFECYCLE), 3)
    lifecycle_wall = round(sum(t for q, t in timings.items() if q in LIFECYCLE), 3)
    payload = {
        "metric": "headline_wall",
        "value": total,
        "unit": "sec",
        "scan_wall": scan_wall,
        "lifecycle_wall": lifecycle_wall,
        "queries": timings,
        "sf": sf,
        "cpus": DEFAULT_CPUS,
        "loadavg": _loadavg(),
        "loadavg_start": loadavg_start,
        "contended": contended,
        "versions": _engine_versions(),
    }
    # Self-describing artifact (VERDICT r9 item 4): the driver's
    # tail-capture truncated BENCH_r09's single JSON line mid-stream
    # (parsed: null), losing the headline. Persisting the same payload
    # beside the repo makes the record independent of capture limits.
    # Clobber guard (VERDICT r11 item 3): a contended capture must not
    # overwrite a committed solo record — the contended run's numbers
    # are uniformly inflated and dirty the git tree every driver round.
    summary_path = _summary_path(contended, REPO_ROOT, timings, DEFAULT_CPUS)
    if summary_path.endswith(".contended.json"):
        print(
            "bench: contended run — preserving the solo "
            f"bench_summary.json, writing {summary_path}",
            file=sys.stderr,
        )
    try:
        with open(summary_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
