#!/usr/bin/env python
"""r12b octave: the prefix-filtering similarity join at 1x vs Nx.

The r11a lesson: every new pair-GENERATING operator gets an octave
before it ships, because quadratic hot-spots re-enter through data
growth. jaccard_pairs_prefix's exposure is the candidate join — a
high-frequency prefix token shared by many docs fans out like any
equi-join hot key.

Methodology: replicate documents Nx with SHIFTED doc_ids and a
PER-COPY suffix appended to EVERY token (so cross-copy Jaccard is 0 —
copies are NOT near-duplicates, output size stays ~Nx base, and we
measure the operator's scan/join scaling, not an output-size
artifact; a short prepended tag would leave cross-copy J ≈ 0.94 and
blow the output quadratically in N — the exact trap this probe
exists to catch). Token frequencies WITHIN each copy keep the real
distribution, so prefix-token hot keys are exercised at Nx.

Exits nonzero if wall grows superlinearly (> factor x 1.5).

Usage: python tools/r12b_octaves.py [--factor 8] [--sf /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    # the engine's own tuned session (AQE coalesce/skew-split, 8g
    # driver) — probes must measure the documented config, and the
    # verify join's arrays-in-flight specifically rely on AQE
    # partition sizing at scale
    from ent_fins_lakehouse_spark.session import get_session

    spark = get_session("r12b_octaves")
    spark.sparkContext.setLogLevel("ERROR")

    from ent_fins_lakehouse_spark.operators.dedup import jaccard_pairs_prefix
    from ent_fins_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    n_base = docs.count()

    def probe(mult: int, name: str) -> float:
        df = docs
        for i in range(1, mult):
            df = df.unionByName(
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.regexp_replace(
                        F.col("text"), r"(\S+)", "$1c%d" % i
                    ).alias("text"),
                )
            )
        df = df.repartition(32).persist()
        df.count()
        for n in (1, 3):
            t0 = time.perf_counter()
            cnt = jaccard_pairs_prefix(df, "doc_id", "text", 0.9, shingle_n=n).count()
            wall = time.perf_counter() - t0
            print(
                f"  {name} shingle_n={n}: docs={n_base * mult}, "
                f"pairs={cnt}, {wall:.2f}s"
            )
            yield_walls.setdefault(n, {})[name] = wall
        df.unpersist()
        return 0.0

    yield_walls: dict = {}
    print("prefix-filter similarity join octave:")
    probe(1, "warm")
    probe(1, "x1")
    probe(args.factor, f"x{args.factor}")
    bad = False
    print("\n| shingle_n | 1x (s) | %dx (s) | ratio |\n|---|---|---|---|" % args.factor)
    for n in (1, 3):
        r = yield_walls[n][f"x{args.factor}"] / yield_walls[n]["x1"]
        print(f"| {n} | {yield_walls[n]['x1']:.2f} | {yield_walls[n][f'x{args.factor}']:.2f} | {r:.2f}x |")
        if r > args.factor * 1.5:
            bad = True
    if bad:
        print(f"FAIL: superlinear growth past {args.factor}x * 1.5")
        return 1
    print("PASS: prefix join scales sublinearly-or-linearly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
