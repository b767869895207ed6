#!/usr/bin/env python
"""The reference's full arc, end to end, on this engine:

CSV ingest → bronze/silver/gold medallion ETL → catalog SQL BI →
MERGE upsert + GDPR DELETE + time travel → ML scoring — the same
sequence as `/root/reference/Instructor/01-Fraud-Delta.py`,
`02- Databricks_SQL_Scripts.sql` and `03-Fraud-ML.py`, as a plain
Python program (see MIGRATION.md for the cell-by-cell map).

Run: python examples/lending_demo.py   (writes under a temp dir)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ent_fins_lakehouse_spark import Medallion, get_session  # noqa: E402
from ent_fins_lakehouse_spark.etl import LOAN_COLUMNS  # noqa: E402
from ent_fins_lakehouse_spark.ml.pipeline import confusion_net, score, train_lr  # noqa: E402
from ent_fins_lakehouse_spark.sources.readers import read_csv  # noqa: E402

ROWS = [
    ("1001", "Fully Paid", "13.56%", "41.8%", "Dec-2015", "Apr-2001", "10+ years", "Source Verified", "12231.89", "10000"),
    ("1002", "Charged Off", "22.9%", "", "Jan-2017", "Sep-2010", "< 1 year", "Verified", "2400.5", "8000"),
    ("1003", "Default", "9.0%", "77.0%", "Mar-2016", "Mar-1999", "3 years", "Not Verified", "100.0", "9000"),
    ("1004", "Fully Paid", "11.11%", "55.5%", "Nov-2014", "Jan-2004", "n/a", "Source Verified", "7100.0", "7000"),
    ("1005", "Charged Off", "19.9%", "60.1%", "Feb-2016", "Feb-2006", "7 years", "Verified", "900.0", "6000"),
] * 40  # small but non-trivial

PAD = ("B", "60000", "18.2", "TX", "36 months", "RENT", "credit_card", "Individual", "0", "24")


def main() -> int:
    spark = get_session(app_name="lending-demo")
    root = tempfile.mkdtemp(prefix="lending_demo_")

    # -- S1: CSV landing
    csv = os.path.join(root, "loans.csv")
    with open(csv, "w") as fh:
        fh.write(",".join(LOAN_COLUMNS) + "\n")
        for i, r in enumerate(ROWS):
            row = (str(1001 + i),) + r[1:] + PAD
            fh.write(",".join(row) + "\n")

    # -- bronze → silver → gold
    med = Medallion(spark, os.path.join(root, "lake"))
    gold = med.run_lending_pipeline(read_csv(spark, csv, infer_schema=False))
    print("gold rows:", gold.count())

    # -- BI queries (02-SQL scripts shape)
    gold.createOrReplaceTempView("gold_lending")
    spark.sql(
        "SELECT grade, SUM(loan_amnt) AS total_loan FROM gold_lending GROUP BY grade"
    ).show()

    # -- DML: GDPR delete + upsert + time travel
    silver = med.table("silver")
    silver.delete("addr_state = 'TX' AND id = '1001'")
    updates = med.read("silver").limit(1).withColumn("grade", F.lit("A"))
    silver.merge(updates, on=["id"])
    print("silver versions:", silver.latest_version() + 1)
    print("v0 rows:", silver.read(version_as_of=0).count(), "now:", silver.read().count())

    # -- Delta interop: export gold in the PUBLIC Delta log format
    # (readable by delta-spark / DuckDB / Polars), soft-delete via
    # deletion vectors, register with the reference's own DDL
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable, open_table

    export = os.path.join(root, "gold_delta")
    dl = DeltaLogTable(spark, export)
    dl.write(med.read("gold"), mode="append")
    dl.delete("grade = 'B' AND bad_loan = 'true'")
    lh = LakehouseSession(spark, os.path.join(root, "warehouse"))
    lh.sql("CREATE DATABASE IF NOT EXISTS lending_club")
    lh.sql(f"CREATE TABLE lending_club.gold USING DELTA LOCATION '{export}'")
    print(
        "delta export rows:",
        lh.sql("SELECT * FROM lending_club.gold").count(),
        "(format:", type(open_table(spark, export)).__name__ + ")",
    )

    # -- ML scoring (03-Fraud-ML shape)
    ds = (
        med.read("gold")
        .withColumn("label", (F.col("bad_loan") == "true").cast("double"))
        .withColumn("int_rate", F.col("int_rate").cast("double"))
        .withColumn("net", F.col("net").cast("double"))
    )
    model = train_lr(ds, cat_cols=["grade", "purpose"], num_cols=["int_rate", "emp_length"])
    scored = score(model, ds, id_cols=["id"])
    confusion_net(scored.join(ds.select("id", "net"), "id"), net_col="net").show()
    print("demo complete:", root)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
