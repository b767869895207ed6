from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Environment contract (VERDICT r10 item 7): the oracle discipline is
# calibrated to specific engine-bridge behaviors (duckdb 1.0.0 returns
# HUGEINT from integer SUM and degrades it to float64 over pandas;
# pyspark 4.1.2 parquet NANOS handling). A silent version bump would
# invalidate that calibration, so the suite refuses loudly with the
# observed versions in the message — re-audit the disciplines (see
# plans/registry.py docstring) before updating the pins.
ENGINE_PINS = {"pyspark": "4.1.2", "duckdb": "1.0.0"}


def pytest_sessionstart(session):
    import duckdb
    import pyspark

    got = {"pyspark": pyspark.__version__, "duckdb": duckdb.__version__}
    if got != ENGINE_PINS:
        raise pytest.UsageError(
            f"engine version drift: expected {ENGINE_PINS}, got {got} — "
            "the oracle type/float disciplines are calibrated per engine "
            "version; re-run tools/oracle_census.py and the driver_sim "
            "sweep, then update ENGINE_PINS"
        )


@pytest.fixture(scope="session")
def spark():
    from ent_fins_lakehouse_spark.session import get_session

    s = get_session(app_name="pytest", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_SMOKE}/{name}.parquet')"
        )
    yield con
    con.close()
