"""Reference-exact ETL semantics (SURVEY.md §5.3): the adversarial
string cases from FIXTURES.md §B run through the silver/gold chain,
plus the end-to-end medallion flow from a dirty CSV."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

RAW_ROWS = [
    # id, loan_status, int_rate, revol_util, issue_d, earliest_cr_line,
    # emp_length, verification_status, total_pymnt, loan_amnt
    ("1001", "Fully Paid", "13.56%", "41.8%", "Dec-2015", "Apr-2001", "10+ years", "Source Verified", "12231.89", "10000"),
    ("1002", "Charged Off", "22.9%", "", "Jan-2017", "Sep-2010", "< 1 year", "Verified", "2400.5", "8000"),
    ("1003", "Default", "9.0%", "77.0%", "Mar-2016", "Mar-1999", "3 years", "Not Verified", "100.0", "9000"),
    ("1004", "Current", "7.5%", "10.0%", "Feb-2018", "Feb-2012", "5 years", "Verified", "50.0", "5000"),  # filtered
    ("1005", "Fully Paid", "11.11%", "55.5%", "Nov-2014", "Jan-2004", "n/a", "Source Verified", "7000.0", "7000"),
]

PAD = ("B", "60000", "18.2", "TX", " 36 months", "RENT", "credit_card", "Individual", "0", "24")


@pytest.fixture(scope="module")
def raw(spark):
    cols = [
        "id", "loan_status", "int_rate", "revol_util", "issue_d",
        "earliest_cr_line", "emp_length", "verification_status",
        "total_pymnt", "loan_amnt", "grade", "annual_inc", "dti",
        "addr_state", "term", "home_ownership", "purpose",
        "application_type", "delinq_2yrs", "total_acc",
    ]
    return spark.createDataFrame([r + PAD for r in RAW_ROWS], cols)


def test_silver_transform_semantics(raw):
    from ent_fins_lakehouse_spark.etl import silver_transform

    got = {r["id"]: r for r in silver_transform(raw).collect()}
    # 'Current' filtered out (P3)
    assert set(got) == {"1001", "1002", "1003", "1005"}
    # bad_loan label as STRING (P6)
    assert got["1001"]["bad_loan"] == "false"
    assert got["1002"]["bad_loan"] == "true"
    assert got["1003"]["bad_loan"] == "true"
    # % stripping (F1) incl. the empty→null path
    assert math.isclose(got["1001"]["int_rate"], 13.56, rel_tol=1e-6)
    assert got["1002"]["revol_util"] is None
    # substring year extraction (F2)
    assert got["1001"]["issue_year"] == 2015.0
    assert got["1001"]["earliest_year"] == 2001.0
    assert got["1001"]["credit_length_in_years"] == 14.0
    # emp_length adversarial chain (FIXTURES.md §B)
    assert got["1001"]["emp_length"] == 10.0
    assert got["1002"]["emp_length"] == 0.0
    assert got["1003"]["emp_length"] == 3.0
    assert got["1005"]["emp_length"] is None


def test_gold_transform_semantics(raw):
    from ent_fins_lakehouse_spark.etl import gold_transform, silver_transform

    got = {r["id"]: r for r in gold_transform(silver_transform(raw)).collect()}
    assert got["1001"]["verification_status"] == "Verified"
    assert got["1003"]["verification_status"] == "Not Verified"
    assert math.isclose(got["1001"]["net"], 2231.89, rel_tol=1e-9)
    assert math.isclose(got["1002"]["net"], -5599.5, rel_tol=1e-9)


def test_medallion_end_to_end_from_csv(spark, tmp_path):
    """S1 CSV ingest → bronze/silver/gold lake tables → time travel
    back to the bronze version (the notebook's whole arc)."""
    from ent_fins_lakehouse_spark.etl import LOAN_COLUMNS, Medallion
    from ent_fins_lakehouse_spark.sources.readers import read_csv

    csv_path = tmp_path / "loans.csv"
    header = ",".join(LOAN_COLUMNS)
    lines = [header] + [",".join(r + PAD) for r in RAW_ROWS]
    csv_path.write_text("\n".join(lines).replace(" 36 months", "36 months"))

    raw = read_csv(spark, str(csv_path), infer_schema=False)
    med = Medallion(spark, str(tmp_path / "lake"))
    gold = med.run_lending_pipeline(raw)
    assert gold.count() == 4
    assert set(gold.columns) >= set(LOAN_COLUMNS) | {
        "bad_loan", "issue_year", "earliest_year", "credit_length_in_years", "net"
    }
    # tiers are independently readable + versioned
    assert med.read("bronze").count() == 5
    assert med.table("silver").latest_version() == 0
    # overwrite silver again -> version bumps, old version still readable
    med.write("silver", med.read("silver").filter(F.col("id") != "1003"))
    assert med.read("silver").count() == 3
    assert med.read("silver", version_as_of=0).count() == 4


def test_ntz_normalization_recurses_into_nested_types(spark):
    """ADVICE r3: TIMESTAMP_NTZ nested in struct/array/map must be
    normalized too, not just top-level columns — one select() pass."""
    import datetime

    from pyspark.sql import types as T

    from ent_fins_lakehouse_spark.sources.readers import _ntz_to_utc

    ts = datetime.datetime(2024, 3, 1, 12, 30, 0)
    schema = T.StructType([
        T.StructField("plain", T.TimestampNTZType()),
        T.StructField("s", T.StructType([
            T.StructField("inner", T.TimestampNTZType()),
            T.StructField("deep", T.ArrayType(T.TimestampNTZType())),
        ])),
        T.StructField("arr", T.ArrayType(T.TimestampNTZType())),
        T.StructField("m", T.MapType(T.StringType(), T.TimestampNTZType())),
        T.StructField("untouched", T.StringType()),
    ])
    df = spark.createDataFrame([(ts, (ts, [ts]), [ts], {"k": ts}, "x")], schema)
    out = _ntz_to_utc(df)
    dt = {f.name: f.dataType for f in out.schema.fields}
    assert dt["plain"] == T.TimestampType()
    assert dt["s"].fields[0].dataType == T.TimestampType()
    assert dt["s"].fields[1].dataType.elementType == T.TimestampType()
    assert dt["arr"].elementType == T.TimestampType()
    assert dt["m"].valueType == T.TimestampType()
    assert dt["untouched"] == T.StringType()
    row = out.collect()[0]
    # session zone is UTC, so wall-clock values are preserved exactly
    assert row["plain"] == ts
    assert row["s"]["inner"] == ts
    assert row["arr"][0] == ts
    assert row["m"]["k"] == ts


def test_ntz_normalization_noop_returns_same_plan(spark):
    """No NTZ anywhere -> the DataFrame is returned untouched (no
    extra projection node)."""
    from ent_fins_lakehouse_spark.sources.readers import _ntz_to_utc

    df = spark.range(3).toDF("n")
    assert _ntz_to_utc(df) is df
