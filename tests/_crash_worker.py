"""SIGKILL crash-storm worker: loops small commits at one table until
killed. Launched by tests/test_crash_recovery.py::
test_sigkill_storm_* as ``python tests/_crash_worker.py <kind> <path>``
in its own session group; the parent SIGKILLs the whole group at a
random moment, so death can land anywhere — mid data-file write, mid
staging, between stage and publish, inside the publish hardlink.
No cleanup handlers run (that is the point: kill -9 semantics, not the
exception-injection windows of the in-process crash tests).

Underscore-prefixed: not a pytest module.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    kind, path = sys.argv[1], sys.argv[2]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    from ent_fins_lakehouse_spark.session import get_session

    spark = get_session(app_name="crash-worker", cpus=2)
    spark.sparkContext.setLogLevel("ERROR")

    if kind == "delta":
        from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

        t = DeltaLogTable(spark, path)
    else:
        from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable

        t = IcebergTable(spark, path)

    i = 0
    while True:  # killed from outside
        base = 1_000_000 + i * 10
        df = spark.createDataFrame(
            [(base + j, f"w{i}") for j in range(3)], "k LONG, v STRING"
        ).coalesce(1)
        if kind == "delta":
            t.write(df, mode="append")
            if i % 7 == 3:
                t.delete(f"k % 10 = {i % 3} AND k >= 1000000")
            elif i % 7 == 5:
                t.optimize(target_files=2)
        else:
            t.append(df, retries=25)
            if i % 7 == 3:
                t.delete(f"k % 10 = {i % 3} AND k >= 1000000", mode="mor", retries=25)
            elif i % 7 == 5:
                t.compact(target_files=2)
        i += 1


if __name__ == "__main__":
    raise SystemExit(main())
