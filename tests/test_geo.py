"""Geospatial operators (plans/geo_queries.py).

q344 cell-blocked distance join: completeness vs a brute-force cross
join at smoke scale (the blocking must not drop edge pairs), plus the
plan properties that make it the 100 TB shape (broadcast equi-join on
cell ids, no cartesian product). q345 haversine top-k: values pinned
against a NumPy reference (the query is rows-only by design — libm
trig is not bit-portable across engines).
"""

from __future__ import annotations

import math

import pytest

from ent_fins_lakehouse_spark.plans.geo_queries import (
    GEO_RADIUS,
    GRID_SPAN,
    KNN_K,
    QUERY_LAT,
    QUERY_LON,
    _customers_xy,
    _suppliers_xy,
    q344_geo_cell_distance_join,
    q345_haversine_knn,
)
from tests.conftest import SF_SMOKE


def test_cell_join_matches_brute_force(spark):
    """The 3×3 cell blocking finds EXACTLY the pairs a cross join finds
    (cell size = R covers the disc; nothing lost at cell edges)."""
    cust = _customers_xy(spark, SF_SMOKE).collect()
    supp = _suppliers_xy(spark, SF_SMOKE).collect()
    expected = {}
    for c in cust:
        for s in supp:
            d2 = (c.cx - s.sx) ** 2 + (c.cy - s.sy) ** 2
            if d2 <= GEO_RADIUS * GEO_RADIUS:
                seg = expected.setdefault(c.c_mktsegment, {"pairs": 0, "custs": set(), "min": None})
                seg["pairs"] += 1
                seg["custs"].add(c.c_custkey)
                seg["min"] = d2 if seg["min"] is None else min(seg["min"], d2)
    got = {r.c_mktsegment: r for r in q344_geo_cell_distance_join(spark, SF_SMOKE).collect()}
    assert set(got) == set(expected)
    for seg, e in expected.items():
        assert got[seg].n_pairs == e["pairs"]
        assert got[seg].n_customers == len(e["custs"])
        assert got[seg].min_d2 == e["min"]


def test_cell_join_plan_is_broadcast_equi_join(spark):
    """No cartesian product anywhere; the supplier cell table is
    broadcast and the join is a hash equi-join on (gx, gy)."""
    plan = q344_geo_cell_distance_join(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_haversine_knn_matches_numpy(spark):
    """Top-k ids and distances agree with a NumPy reference."""
    np = pytest.importorskip("numpy")
    rows = _customers_xy(spark, SF_SMOKE).collect()
    keys = np.array([r.c_custkey for r in rows])
    lat = np.array([r.cy for r in rows], dtype=np.float64) / GRID_SPAN * 120.0 - 60.0
    lon = np.array([r.cx for r in rows], dtype=np.float64) / GRID_SPAN * 360.0 - 180.0
    lat1, lon1 = math.radians(QUERY_LAT), math.radians(QUERY_LON)
    lat2, lon2 = np.radians(lat), np.radians(lon)
    a = np.sin((lat2 - lat1) / 2) ** 2 + math.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    dist = 2 * 6371.0 * np.arcsin(np.sqrt(a))
    order = np.lexsort((keys, dist))[:KNN_K]
    expected = list(zip(keys[order].tolist(), dist[order].tolist()))

    got = q345_haversine_knn(spark, SF_SMOKE).collect()
    assert len(got) == KNN_K
    assert [r.c_custkey for r in got] == [k for k, _ in expected]
    for r, (_, d) in zip(got, expected):
        assert r.dist_km == pytest.approx(d, rel=1e-9)


def test_haversine_knn_plan_is_take_ordered(spark):
    """ORDER BY + LIMIT k plans as TakeOrderedAndProject (local per-
    partition top-k + k-row driver merge), not a global Sort."""
    plan = q345_haversine_knn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
