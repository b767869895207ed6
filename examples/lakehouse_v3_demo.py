#!/usr/bin/env python
"""Modern-lakehouse (v3-era) lifecycle, end to end, on this engine:

create → enable ROW LINEAGE → streaming-shaped small appends →
DV soft delete → ADD COLUMN ... DEFAULT (metadata-only backfill) →
selective BIN-PACK compaction (only the small-file debt rewrites;
row ids preserved) → UniForm: convert to an Iceberg twin whose
`_row_id`s are IDENTICAL to the Delta side's row tracking.

Run: python examples/lakehouse_v3_demo.py   (writes under a temp dir)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ent_fins_lakehouse_spark import get_session  # noqa: E402
from ent_fins_lakehouse_spark.sources.iceberg import (  # noqa: E402
    IcebergTable,
    convert_delta_to_iceberg,
)
from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable  # noqa: E402


def main() -> int:
    spark = get_session(app_name="lakehouse-v3-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="v3demo_")

    # ---- Iceberg side: row lineage + defaults + binpack -------------
    ice = IcebergTable(spark, os.path.join(root, "loans_ice"))
    loans = spark.range(0, 5000).selectExpr(
        "id AS loan_id", "CAST(1000 + id % 9000 AS DOUBLE) AS principal"
    )
    ice.append(loans.limit(0).coalesce(1))
    ice.enable_row_lineage()
    ice.append(loans.coalesce(1).sortWithinPartitions("loan_id"))
    for b in range(5):  # streaming-shaped debt
        ice.append(
            spark.range(5000 + b * 20, 5020 + b * 20)
            .selectExpr("id AS loan_id", "CAST(500 AS DOUBLE) AS principal")
            .coalesce(1)
        )
    print("files after ingest:", len(ice.data_files()))

    ice.delete("loan_id % 17 = 3", mode="dv")
    print("DV delete: rows now", ice.read().count(), "— no file rewritten")

    ice.add_column("grade", "string", default="unrated")
    print(
        "defaulted column, metadata-only backfill:",
        ice.read().filter("grade = 'unrated'").count(),
        "rows read the default",
    )

    pre = {r.loan_id: r._row_id for r in ice.read_with_lineage().collect()}
    big = max(ice.data_files(), key=os.path.getsize)
    res = ice.rewrite_small_files(small_file_threshold_bytes=os.path.getsize(big))
    post = {r.loan_id: r._row_id for r in ice.read_with_lineage().collect()}
    print(
        f"binpack: {res['files_selected']} debt files -> "
        f"{res['files_after']} total; row ids preserved: {pre == post}"
    )

    # ---- Delta side: row tracking -> UniForm twin with SAME ids -----
    dl = DeltaLogTable(spark, os.path.join(root, "loans_dl"))
    dl.write(loans.coalesce(2), mode="append")
    dl.enable_row_tracking()
    dl.write(
        spark.range(5000, 5100).selectExpr(
            "id AS loan_id", "CAST(500 AS DOUBLE) AS principal"
        ),
        mode="append",
    )
    twin = convert_delta_to_iceberg(spark, dl, os.path.join(root, "loans_twin"))
    d_ids = {r.loan_id: r._row_id for r in dl.read_with_row_ids().collect()}
    t_ids = {r.loan_id: r._row_id for r in twin.read_with_lineage().collect()}
    print(
        "UniForm: Delta baseRowId == Iceberg first_row_id for all rows:",
        d_ids == t_ids,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
