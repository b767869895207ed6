"""Lending medallion ETL — the reference's bronze→silver→gold chain
as a composable library.

Reproduces the transform semantics of
`/root/reference/Instructor/01-Fraud-Delta.py:55-80` (silver) and
`:250-259` (gold) exactly — column list, isin filter, label cast,
percent-stripping, substring-year extraction, the three-step
emp_length regex normalization, verification-status collapse, and the
rounded net column — while the storage tier is our ACID lake layer
instead of managed Delta.

Every function is DataFrame→DataFrame and narrow (no shuffles): at
100 TB the whole silver chain is one codegen'd map stage fused into
the scan, with the isin filter pushed to the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: `Instructor/01-Fraud-Delta.py:59` — the 20-column projection.
LOAN_COLUMNS = [
    "id",
    "loan_status",
    "int_rate",
    "revol_util",
    "issue_d",
    "earliest_cr_line",
    "emp_length",
    "verification_status",
    "total_pymnt",
    "loan_amnt",
    "grade",
    "annual_inc",
    "dti",
    "addr_state",
    "term",
    "home_ownership",
    "purpose",
    "application_type",
    "delinq_2yrs",
    "total_acc",
]

#: `Instructor/01-Fraud-Delta.py:63` — closed-outcome statuses only.
FINAL_STATUSES = ["Default", "Charged Off", "Fully Paid"]


def select_loan_columns(df: DataFrame) -> DataFrame:
    """P1: project the 20 modeling columns (`:59`)."""
    return df.select(*LOAN_COLUMNS)


def label_bad_loans(df: DataFrame) -> DataFrame:
    """P3+P6: keep finished loans, derive the string label
    (`:63-64`) — bad = anything but Fully Paid."""
    return df.filter(F.col("loan_status").isin(FINAL_STATUSES)).withColumn(
        "bad_loan", (F.col("loan_status") != "Fully Paid").cast("string")
    )


def clean_rates(df: DataFrame) -> DataFrame:
    """F1+P9: strip ``%`` from rate columns and cast to float
    (`:69-70`). Empty strings cast to null, the reference's implicit
    null path for revol_util."""
    return df.withColumn(
        "int_rate", F.regexp_replace("int_rate", "%", "").try_cast("float")
    ).withColumn("revol_util", F.regexp_replace("revol_util", "%", "").try_cast("float"))


def derive_credit_years(df: DataFrame) -> DataFrame:
    """F2+P7: issue/earliest year from the ``MMM-yyyy`` string dates by
    position (`:71-73`), and the credit-length difference."""
    return (
        df.withColumn("issue_year", F.substring("issue_d", 5, 4).try_cast("double"))
        .withColumn("earliest_year", F.substring("earliest_cr_line", 5, 4).try_cast("double"))
        .withColumn("credit_length_in_years", F.col("issue_year") - F.col("earliest_year"))
    )


def normalize_emp_length(df: DataFrame) -> DataFrame:
    """F1 three-step chain (`:78-80`): strip trailing words and n/a →
    "< 1"→0, "10+"→10, cast float. "n/a" collapses to the empty string
    which casts to null — the reference's null semantics."""
    c = F.trim(F.regexp_replace(F.col("emp_length"), r"([ ]*+[a-zA-Z].*)|(n/a)", ""))
    c = F.trim(F.regexp_replace(c, "< 1", "0"))
    c = F.trim(F.regexp_replace(c, r"10\+", "10")).try_cast("float")
    return df.withColumn("emp_length", c)


def silver_transform(df: DataFrame) -> DataFrame:
    """The full bronze→silver cell sequence (`:59-80`)."""
    out = select_loan_columns(df)
    out = label_bad_loans(out)
    out = clean_rates(out)
    out = derive_credit_years(out)
    return normalize_emp_length(out)


def collapse_verification(df: DataFrame) -> DataFrame:
    """Gold step 1 (`:254`): 'Source Verified' → 'Verified'."""
    return df.withColumn(
        "verification_status",
        F.trim(F.regexp_replace("verification_status", "Source Verified", "Verified")),
    )


def derive_net(df: DataFrame) -> DataFrame:
    """Gold step 2 (`:258`): money earned/lost per loan, 2-decimal.
    Explicit double casts — the reference got them implicitly from CSV
    schema inference; uninferred (string) input must not change the
    result."""
    return df.withColumn(
        "net",
        F.round(
            F.col("total_pymnt").try_cast("double") - F.col("loan_amnt").try_cast("double"), 2
        ),
    )


def gold_transform(df: DataFrame) -> DataFrame:
    """silver→gold (`:252-259`)."""
    return derive_net(collapse_verification(df))


class Medallion:
    """Bronze/silver/gold tier convention over the ACID lake layer
    (path variables at `Instructor/01-Fraud-Delta.py:86-100`; tier
    writes at `:116,223,259`). Bronze is the raw ingest copy; silver
    and gold are derived, each an ACID table supporting DML,
    time travel, and streaming reads."""

    TIERS = ("bronze", "silver", "gold")

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, tier: str) -> str:
        if tier not in self.TIERS:
            raise ValueError(f"unknown tier {tier!r}")
        return os.path.join(self.root, tier)

    def table(self, tier: str):
        from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

        return LakeTable(self.spark, self.path(tier))

    def write(self, tier: str, df: DataFrame, mode: str = "overwrite"):
        return self.table(tier).write(df, mode=mode)

    def read(self, tier: str, version_as_of: int | None = None) -> DataFrame:
        return self.table(tier).read(version_as_of=version_as_of)

    def run_lending_pipeline(self, raw: DataFrame) -> DataFrame:
        """CSV/raw → bronze → silver → gold, returning the gold frame
        (the notebook's end-to-end flow)."""
        self.write("bronze", raw)
        self.write("silver", silver_transform(self.read("bronze")))
        self.write("gold", gold_transform(self.read("silver")))
        return self.read("gold")
