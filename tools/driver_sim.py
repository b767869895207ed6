"""Simulate the driver's verify pass: import __spark_entry__ like an
external consumer, run entry() smoke at sf0.001 and every queries()
entry against its oracle_sql() via DuckDB at sf0.01.

Deliberately does NOT use the engine's tuned session: the driver owns
its SparkSession, so queries must be robust to ambient config (probe:
pass --tz to pin a hostile session timezone).
"""

from __future__ import annotations

import argparse
import math
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_rows(cols, rows):
    import datetime

    def nv(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        if isinstance(v, datetime.date):
            return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
        if isinstance(v, (list, tuple)):
            return tuple(nv(x) for x in v)
        return v

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(nv(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default=None, help="hostile session timezone probe")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[8]").appName("driver-sim")
    if args.tz:
        b = b.config("spark.sql.session.timeZone", args.tz)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    t0 = time.time()
    n = e.entry(spark).count()
    print(f"SMOKE entry(): {n} rows in {time.time() - t0:.1f}s")
    assert n > 0

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    qmap, omap = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in sorted(qmap.items()):
        if args.only and not re.search(args.only, name):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name in omap:
                duck = con.execute(omap[name])
                dcols = [d[0] for d in duck.description]
                drows = duck.fetchall()
                ok_cols = sorted(scols) == sorted(dcols)
                ok_cnt = len(srows) == len(drows)
                ok_vals = ok_cols and ok_cnt and norm_rows(scols, srows) == norm_rows(dcols, drows)
                status = "MATCH" if (ok_cols and ok_cnt and ok_vals) else "MISMATCH"
                if status == "MISMATCH":
                    failed.append(name)
                    a, b2 = norm_rows(scols, srows), norm_rows(dcols, drows)
                    diff = next(((i, x, y) for i, (x, y) in enumerate(zip(a, b2)) if x != y), None)
                    print(f"  cols ok={ok_cols} cnt spark={len(srows)} duck={len(drows)} first_diff={diff}")
            else:
                status = "ROWS_ONLY"
            print(f"{status:9s} {name}: {len(srows)} rows in {time.time() - t0:.1f}s")
        except Exception as ex:
            failed.append(name)
            print(f"ERROR     {name}: {type(ex).__name__}: {str(ex)[:200]}")
    print(f"\n{len(qmap)} queries, {len(failed)} failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
