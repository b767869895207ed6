"""Cross-process DML storm worker (VERDICT r13 item 3).

One OS process = one real concurrent writer: its own Python runtime,
its own JVM-backed SparkSession, its own table handles — nothing
shared with the other writers but the table directory, exactly the
deployment shape (N jobs on N drivers committing to one lakehouse
path). The thread-based storms in test_concurrency.py share a JVM and
a Python runtime, which serializes some interleavings (GIL, shared
Hadoop FS objects) that real deployments DO hit; this worker removes
that shelter.

Launched by tests/test_concurrency.py::test_cross_process_dml_storm as
``python tests/_storm_worker.py <schedules.json> <wid> <n_workers>
<sync_dir> <out_dir>``. Reuses the randomized op vocabulary and
backend wrappers from test_concurrency so process- and thread-level
storms exercise the same verb distribution. A file barrier aligns all
workers at each schedule start so contention is real, not accidental.

Underscore-prefixed: not a pytest module.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time


def _barrier(sync_dir: str, tag: str, wid: int, n: int, timeout: float = 300.0) -> None:
    """All n workers rendezvous on ready files before proceeding."""
    mine = os.path.join(sync_dir, f"{tag}.w{wid}")
    with open(mine, "w") as fh:
        fh.write("ready")
    deadline = time.monotonic() + timeout
    want = {os.path.join(sync_dir, f"{tag}.w{i}") for i in range(n)}
    while time.monotonic() < deadline:
        if all(os.path.exists(p) for p in want):
            return
        time.sleep(0.02)
    raise TimeoutError(f"barrier {tag} timed out waiting for peers")


def main() -> int:
    schedules_path, wid_s, n_s, sync_dir, out_dir = sys.argv[1:6]
    wid, n_workers = int(wid_s), int(n_s)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    sys.path.insert(0, os.path.join(repo_root, "tests"))

    import test_concurrency as tc  # the shared op vocabulary/backends

    from ent_fins_lakehouse_spark.session import get_session

    spark = get_session(app_name=f"storm-worker-{wid}", cpus=2)
    spark.sparkContext.setLogLevel("ERROR")

    with open(schedules_path) as fh:
        schedules = json.load(fh)

    for sched in schedules:
        sid, kind, path, seed = (
            sched["id"],
            sched["kind"],
            sched["path"],
            sched["seed"],
        )
        _barrier(sync_dir, f"s{sid}", wid, n_workers)
        rng = random.Random(seed * 1000 + wid)
        if kind == "delta":
            table = tc._DeltaOps(spark, path)
        elif kind == "iceberg":
            table = tc._IceOps(spark, path, random.Random(seed * 7 + wid))
        else:
            raise ValueError(kind)
        model: dict[int, int] = {}
        ops = tc._ops_for(spark, table, wid, rng, model)
        for _ in range(tc.N_OPS):
            op = rng.choice(ops)
            tc._eventually(op, rng)
        with open(os.path.join(out_dir, f"model_s{sid}_w{wid}.json"), "w") as fh:
            json.dump({str(k): v for k, v in model.items()}, fh)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
