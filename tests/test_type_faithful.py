"""Integer/type discipline for the DuckDB oracles (VERDICT r10 items 1+2).

The driver hashes DuckDB oracle results through a pandas/Arrow bridge
that degrades HUGEINT (int128) to float64, so an oracle whose values
are bit-identical to Spark's can still hash-FAIL on type alone. These
tests pin both defenses:

1. tools/oracle_census.py reports zero HUGEINT-class columns across
   every registered oracle (the "integer discipline").
2. tools/driver_sim.py's type_faithful() fails loudly on a
   deliberately-planted HUGEINT oracle (so the class can't re-enter
   via a future query whose oracle forgets the CAST).
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from driver_sim import type_faithful, type_kind_duck, type_kind_spark  # noqa: E402
from oracle_census import check_type  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


def test_check_type_bans_hugeint_class():
    assert not check_type("HUGEINT")
    assert not check_type("UHUGEINT")
    assert not check_type("UBIGINT")
    assert check_type("BIGINT")
    assert check_type("DECIMAL(18,4)")
    assert check_type("VARCHAR")
    assert check_type("TIMESTAMP")
    assert check_type("DOUBLE[]")


def test_type_kind_mapping():
    assert type_kind_duck("HUGEINT") == "BANNED"
    assert type_kind_duck("BIGINT") == type_kind_spark("bigint") == "int"
    assert type_kind_duck("INTEGER") == type_kind_spark("int")
    assert type_kind_duck("DOUBLE") == type_kind_spark("double") == "float"
    assert type_kind_duck("DECIMAL(18,4)") == type_kind_spark("decimal(18,4)") == "decimal"
    assert type_kind_duck("DATE") == type_kind_spark("date") == "date"
    assert type_kind_duck("TIMESTAMP") == type_kind_spark("timestamp") == "timestamp"
    assert type_kind_duck("VARCHAR") == type_kind_spark("string") == "string"
    assert type_kind_duck("BOOLEAN") == type_kind_spark("boolean") == "boolean"
    assert type_kind_duck("BIGINT[]") == type_kind_spark("array<bigint>") == "array"
    # date vs timestamp must NOT be conflated (the driver hashes them
    # differently even though norm_rows() renders them identically)
    assert type_kind_duck("TIMESTAMP") != type_kind_spark("date")


def test_planted_hugeint_fails_loudly():
    """A SUM-over-integers oracle (no CAST) must be flagged even when
    values would normalize equal — exactly the r10 q126/q129 class."""
    con = duckdb.connect()
    rel = con.sql("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x) LIMIT 0")
    assert str(rel.types[0]).upper() == "HUGEINT"  # environment contract
    bad = type_faithful(["s"], ["bigint"], rel.columns, rel.types)
    assert bad and "HUGEINT" in bad[0]
    # and the fixed form passes
    rel2 = con.sql("SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x) LIMIT 0")
    assert type_faithful(["s"], ["bigint"], rel2.columns, rel2.types) == []


def test_kind_mismatch_flagged():
    con = duckdb.connect()
    rel = con.sql("SELECT DATE '2024-01-01' AS d LIMIT 0")
    assert type_faithful(["d"], ["timestamp"], rel.columns, rel.types)
    assert type_faithful(["d"], ["date"], rel.columns, rel.types) == []


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_registry_census_clean():
    """Registry-wide: zero HUGEINT-class oracle columns (fresh process
    so the lazy manifest path is exercised like the driver)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "oracle_census.py"), "--sf", SF_DIR],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "census clean" in out.stdout
