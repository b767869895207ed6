#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<round>/.

Round dir from $SPARK_GRAFT_PLANS_ROUND (default r15).

Usage: python tools/dump_plans.py before q53_minhash_lsh_dedup q373_...
       python tools/dump_plans.py after  q53_minhash_lsh_dedup

Runs each query function at $SPARK_GRAFT_SF_DIR (default sf0.1) and
writes plans/r14/<name>_<tag>.txt. Lifecycle queries execute their
fixture builds as a side effect; the captured plan is the returned
DataFrame's (the bench-timed final plan).
"""
from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

tag = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from ent_fins_lakehouse_spark.session import get_session
from ent_fins_lakehouse_spark.plans.registry import queries_map

spark = get_session(app_name=f"plans_{tag}")
spark.sparkContext.setLogLevel("ERROR")
qmap = queries_map()
out_dir = os.path.join(
    REPO_ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
)
os.makedirs(out_dir, exist_ok=True)

for name in names:
    df = qmap[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines)", flush=True)
