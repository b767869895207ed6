"""Registry-wide oracle type census.

The driver hashes DuckDB oracle results through a pandas/Arrow bridge
that degrades types Spark cannot represent (HUGEINT/int128 -> float64),
so an oracle whose VALUES are bit-identical to Spark's can still
hash-FAIL on TYPE alone. This tool prepares every registered oracle in
DuckDB (LIMIT 0 — no data scan) and reports any column whose type is
outside the Spark-representable set.

Usage: python tools/oracle_census.py [--sf /root/testdata/sf0.01]
Exit 0 iff zero offending columns.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

# Types the driver's hash pipeline preserves faithfully. DuckDB type
# names as rendered by str(DuckDBPyType).
SPARK_REPRESENTABLE_PREFIXES = (
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "DECIMAL",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BLOB",
    "INTERVAL",
    "STRUCT",
    "MAP",
)
# LIST(...) of a representable element is fine; HUGEINT / UHUGEINT /
# UINTEGER / UBIGINT / TIME / UUID / ENUM / BIT are not.
BANNED_TOKENS = ("HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")


def check_type(tname: str) -> bool:
    """True iff the DuckDB type name survives the driver bridge."""
    t = tname.upper()
    for tok in BANNED_TOKENS:
        if tok in t:
            return False
    base = t
    while base.endswith("[]"):
        base = base[:-2]
    if base.startswith("LIST(") or base.startswith("ARRAY("):
        base = base[base.index("(") + 1 :]
    return any(base.startswith(p) for p in SPARK_REPRESENTABLE_PREFIXES)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    omap = e.oracle_sql()
    bad: list[tuple[str, str, str]] = []
    for name in sorted(omap):
        rel = con.sql(f"SELECT * FROM ({omap[name]}) LIMIT 0")
        for col, typ in zip(rel.columns, rel.types):
            if not check_type(str(typ)):
                bad.append((name, col, str(typ)))
    if bad:
        print(f"{len(bad)} non-Spark-representable oracle columns:")
        for name, col, typ in bad:
            print(f"  {name}: {col} -> {typ}")
        return 1
    print(f"census clean: {len(omap)} oracles, 0 non-representable columns")
    return 0


if __name__ == "__main__":
    sys.exit(main())
