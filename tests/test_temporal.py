"""As-of / range join semantics on hand-built cases (the registry
query q26/q27 cover oracle parity at corpus scale; these pin the edge
cases: ties, no-match, tolerance, inner mode, bucket boundaries)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01 10:00:05")),
            (2, "A", ts("2024-01-01 10:01:00")),
            (3, "B", ts("2024-01-01 10:00:00")),  # no quote yet
            (4, "B", ts("2024-01-01 10:02:00")),
            (5, "C", ts("2024-01-01 10:00:00")),  # tie with quote ts
        ],
        "trade_id LONG, sym STRING, t TIMESTAMP",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:00"), 100.0),
            ("A", ts("2024-01-01 10:00:30"), 101.0),
            ("B", ts("2024-01-01 10:01:00"), 200.0),
            ("C", ts("2024-01-01 10:00:00"), 300.0),  # exactly at trade ts
        ],
        "sym STRING, qt TIMESTAMP, px DOUBLE",
    )


def _run(trades, quotes, **kw):
    from ent_fins_lakehouse_spark.operators.temporal import asof_join

    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt",
                    value_cols=["px"], **kw)
    return {r["trade_id"]: (r["px"], r["matched_ts"]) for r in out.collect()}


def test_asof_backward_and_ties(trades, quotes):
    got = _run(trades, quotes)
    assert got[1][0] == 100.0  # 10:00:05 → quote at 10:00:00
    assert got[2][0] == 101.0  # 10:01:00 → quote at 10:00:30
    assert got[3][0] is None  # no quote before 10:00:00
    assert got[4][0] == 200.0
    assert got[5][0] == 300.0  # same-timestamp quote matches (at-or-before)


def test_asof_inner_drops_unmatched(trades, quotes):
    got = _run(trades, quotes, how="inner")
    assert set(got) == {1, 2, 4, 5}


def test_asof_tolerance(trades, quotes):
    got = _run(trades, quotes, tolerance_seconds=29)
    assert got[1][0] == 100.0  # 5s old
    assert got[2][0] is None  # 30s old > 29s tolerance
    assert got[4][0] is None  # 60s old
    assert got[5][0] == 300.0  # 0s old


def test_range_join_matches_naive(spark):
    """Bucketed band join == naive inequality join on random-ish data,
    including boundary-exact deltas."""
    from ent_fins_lakehouse_spark.operators.temporal import range_join_bucketed

    left = spark.createDataFrame(
        [(i, "k", ts("2024-01-01 00:00:00").replace(minute=i % 60)) for i in range(40)],
        "lid LONG, k STRING, t TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(j, "k", ts("2024-01-01 00:00:00").replace(minute=(j * 7) % 60, second=j % 2)) for j in range(40)],
        "rid LONG, k STRING, rt TIMESTAMP",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join_bucketed(
            left, right, ["k"], "t", "rt", lower_seconds=0, upper_seconds=600
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(right, "k")
        .filter(
            (F.unix_micros("rt") - F.unix_micros("t") >= 0)
            & (F.unix_micros("rt") - F.unix_micros("t") <= 600 * 1_000_000)
        )
        .collect()
    }
    assert got == naive and got


def test_scd2_apply_batches(spark, tmp_path):
    """SCD2 contract: bootstrap, change closes + re-inserts, new key
    inserts, unchanged keys untouched, full snapshot batches safe."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.operators.temporal import scd2_apply
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], "k INT, tier STRING"
    )
    t = LakeTable(spark, str(tmp_path / "scd"))
    r0 = scd2_apply(t, dim, ["k"], ["tier"], "2020-01-01")
    assert r0["bootstrap"] and r0["inserted"] == 3
    # full snapshot: only k=2 changed, k=4 new
    b1 = spark.createDataFrame(
        [(1, "gold"), (2, "gold"), (3, "bronze"), (4, "iron")], "k INT, tier STRING"
    )
    scd2_apply(t, b1, ["k"], ["tier"], "2021-06-15")
    hist = {
        (r["k"], r["tier"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in t.read().collect()
    }
    assert hist == {
        (1, "gold", "2020-01-01", "None", True),
        (2, "silver", "2020-01-01", "2021-06-15", False),
        (2, "gold", "2021-06-15", "None", True),
        (3, "bronze", "2020-01-01", "None", True),
        (4, "iron", "2021-06-15", "None", True),
    }
    # second change to the same key stacks a third version
    scd2_apply(
        t,
        spark.createDataFrame([(2, "platinum")], "k INT, tier STRING"),
        ["k"],
        ["tier"],
        "2022-01-01",
    )
    k2 = t.read().filter("k = 2").orderBy("valid_from").collect()
    assert [r["tier"] for r in k2] == ["silver", "gold", "platinum"]
    assert [r["is_current"] for r in k2] == [False, False, True]
    cur = t.read().filter("is_current")
    assert cur.count() == 4
    # no-change batch is a no-op on history size
    n = t.read().count()
    scd2_apply(t, b1.filter("k <> 2"), ["k"], ["tier"], "2023-01-01")
    assert t.read().count() == n
