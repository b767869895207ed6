"""Differential tests: every registered query with an oracle must match
DuckDB on the same parquet (sf0.001 locally; the driver re-runs the
same contract at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.util_compare import assert_frames_match


def _specs():
    from ent_fins_lakehouse_spark.plans.registry import QUERIES, _load_all

    _load_all()
    return [s for s in QUERIES.values() if s.oracle is not None]


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    spark_pdf = spec.fn(spark, SF_SMOKE).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, spec.name)


def test_rows_only_queries_run(spark):
    from ent_fins_lakehouse_spark.plans.registry import QUERIES, _load_all

    _load_all()
    for spec in QUERIES.values():
        if spec.oracle is None:
            df = spec.fn(spark, SF_SMOKE)
            assert df.count() >= 0, spec.name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
