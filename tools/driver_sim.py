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


def type_kind_spark(dt: str) -> str:
    """Collapse a Spark simpleString dtype to a comparison kind.

    Integer widths <= 64 bits deliberately collapse to ONE kind (the
    VERDICT r10 item-2 spec: "int<->int with width <= 64"): the r10
    q126/q129 failures were VALUE degradation (int128 -> float64
    renders 3557.0 vs 3557), which no width <= 64 exhibits — int32 and
    int64 render the same value through the driver's hash bridge, as
    nine rounds of green samples over mixed-width queries confirm.
    FLOAT/REAL vs DOUBLE likewise only differ when a value needs more
    than 24 mantissa bits, which the float discipline (DECIMAL sums
    cast to DOUBLE on both sides) already rules out."""
    d = dt.lower()
    if d.startswith("decimal"):
        return "decimal"
    if d in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"):
        return "int"
    if d in ("float", "double"):
        return "float"
    if d.startswith("timestamp"):
        return "timestamp"
    if d in ("string", "varchar"):
        return "string"
    if d.startswith("array"):
        return "array"
    if d.startswith("struct"):
        return "struct"
    if d.startswith("map"):
        return "map"
    return d  # date, boolean, binary, ...


def type_kind_duck(dt: str) -> str:
    """Collapse a DuckDB type name to a comparison kind.

    Returns 'BANNED' for types the driver's pandas/Arrow hash bridge
    degrades (HUGEINT -> float64 — the r10 q126/q129 failure class):
    those can NEVER silently pass, even if values normalize equal.
    """
    d = dt.upper()
    for tok in ("HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        if tok in d:
            return "BANNED"
    if d.startswith("DECIMAL"):
        return "decimal"
    if d in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int"
    if d in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if d.startswith("TIMESTAMP"):
        return "timestamp"
    if d == "DATE":
        return "date"
    if d == "VARCHAR":
        return "string"
    if d == "BOOLEAN":
        return "boolean"
    if d == "BLOB":
        return "binary"
    if d.endswith("[]") or d.startswith("LIST") or d.startswith("ARRAY"):
        return "array"
    if d.startswith("STRUCT"):
        return "struct"
    if d.startswith("MAP"):
        return "map"
    return d


def type_faithful(scols, sdtypes, dcols, dtypes):
    """Per sorted column name, assert the DuckDB result type is
    Spark-representable AND equal in kind to the Spark dtype. The old
    norm_rows-only compare converted both sides to Python scalars
    first, masking exactly the int128-vs-int64 difference the real
    driver hashes (VERDICT r10 item 2)."""
    smap = {c: type_kind_spark(t) for c, t in zip(scols, sdtypes)}
    dmap = {c: type_kind_duck(str(t)) for c, t in zip(dcols, dtypes)}
    bad = []
    for c in sorted(smap):
        sk, dk = smap[c], dmap.get(c)
        if dk == "BANNED":
            bad.append(f"{c}: oracle type not Spark-representable (HUGEINT-class)")
        elif dk is not None and sk != dk:
            bad.append(f"{c}: spark={sk} oracle={dk}")
    return bad


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

    import platform

    import duckdb
    import pyspark
    from pyspark.sql import SparkSession

    # environment contract in the output (the r10 failure class was a
    # duckdb-bridge behavior — version must be diagnosable from logs)
    print(
        f"ENGINES python={platform.python_version()} pyspark={pyspark.__version__} "
        f"duckdb={duckdb.__version__}"
    )

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
                # DB-API description degrades types to NUMBER/STRING;
                # the relation API exposes true DuckDB types (HUGEINT etc.)
                drel = con.sql(f"SELECT * FROM ({omap[name]}) LIMIT 0")
                type_bad = type_faithful(
                    scols, [t for _, t in sdf.dtypes], drel.columns, drel.types
                )
                ok_vals = ok_cols and ok_cnt and norm_rows(scols, srows) == norm_rows(dcols, drows)
                status = "MATCH" if (ok_cols and ok_cnt and ok_vals and not type_bad) else "MISMATCH"
                if status == "MISMATCH":
                    failed.append(name)
                    if type_bad:
                        print(f"  TYPE-UNFAITHFUL: {type_bad}")
                    a, b2 = norm_rows(scols, srows), norm_rows(dcols, drows)
                    diff = next(((i, x, y) for i, (x, y) in enumerate(zip(a, b2)) if x != y), None)
                    print(f"  cols ok={ok_cols} cnt spark={len(srows)} duck={len(drows)} first_diff={diff}")
            else:
                status = "ROWS_ONLY"
            print(f"{status:9s} {name}: {len(srows)} rows in {time.time() - t0:.1f}s")
        except Exception as ex:
            failed.append(name)
            print(f"ERROR     {name}: {type(ex).__name__}: {str(ex)[:200]}")
        finally:
            # queries are independently runnable by contract; a cached
            # relation surviving its query is pure driver-heap ballast.
            # Without this, a full sf0.1 sweep accumulated enough cached
            # blocks over ~350 queries to OOM the default 1g driver heap
            # (r13: q65's collect tipped it) — per-query it is noise.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
    print(f"\n{len(qmap)} queries, {len(failed)} failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
