"""Geospatial operators (SURVEY.md §2.12 extension — geo family).

The reference corpus has no geospatial workload, but any 100 TB
event/entity lakehouse grows one (store/courier proximity, geo-fenced
fraud rules). Two operators cover the two canonical shapes:

* q344 — **cell-blocked distance join**: the scale pattern for "all
  pairs within radius R". Never a cross join: each probe point expands
  to its 3×3 grid-cell neighborhood (bounded fan-out 9) and the join is
  a plain equi-join on the cell id, so Catalyst plans a broadcast/hash
  join and the candidate set is O(points × density), not O(n²) — the
  same bounded-blocking discipline as the LSH dedup family
  (`operators/blocking.py`). All arithmetic is 64-bit integer on a
  micro-degree grid, so the DuckDB oracle hashes bit-for-bit.
* q345 — **haversine top-k** (nearest entities to a query point):
  great-circle math entirely in JVM codegen (`radians/sin/cos/asin`),
  ranked with `ORDER BY … LIMIT k` which Spark executes as
  TakeOrderedAndProject — per-partition local top-k then a k-row
  driver merge, no global sort shuffle. Rows-only (libm trig is not
  bit-portable across engines — the SCALING.md rounding-caveat class);
  `tests/test_geo.py` checks it against a NumPy reference.

Coordinates are synthesized deterministically from the entity keys
(LCG-style multipliers mod 1e6 micro-units) so both engines derive the
exact same geometry from the shared parquet — the same device the
dedup fixtures use for reproducible inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ent_fins_lakehouse_spark.plans.registry import query
from ent_fins_lakehouse_spark.sources.readers import load_table

#: micro-degree span of the synthetic grid (1e6 units per axis).
GRID_SPAN = 1_000_000
#: radius in micro-units for the q344 distance join; also the cell size,
#: so a disc of radius R is always covered by the 3×3 cell neighborhood.
GEO_RADIUS = 25_000


def _customers_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with deterministic integer micro-coordinates."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("long")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        ((k * F.lit(48271)) % GRID_SPAN).alias("cx"),
        ((k * F.lit(16807)) % GRID_SPAN).alias("cy"),
    )


def _suppliers_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with deterministic integer micro-coordinates."""
    s = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("long")
    return s.select(
        "s_suppkey",
        ((k * F.lit(69621)) % GRID_SPAN).alias("sx"),
        ((k * F.lit(40692)) % GRID_SPAN).alias("sy"),
    )


@query(
    "q344_geo_cell_distance_join",
    oracle=f"""
    WITH cust AS (
      SELECT c_custkey, c_mktsegment,
             (CAST(c_custkey AS BIGINT) * 48271) % {GRID_SPAN} AS cx,
             (CAST(c_custkey AS BIGINT) * 16807) % {GRID_SPAN} AS cy
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey,
             (CAST(s_suppkey AS BIGINT) * 69621) % {GRID_SPAN} AS sx,
             (CAST(s_suppkey AS BIGINT) * 40692) % {GRID_SPAN} AS sy
      FROM supplier
    ),
    offs AS (
      SELECT dx, dy
      FROM (VALUES (-1), (0), (1)) a(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) b(dy)
    ),
    probe AS (
      SELECT c.c_custkey, c.c_mktsegment, c.cx, c.cy,
             (c.cx // {GEO_RADIUS}) + o.dx AS gx,
             (c.cy // {GEO_RADIUS}) + o.dy AS gy
      FROM cust c CROSS JOIN offs o
    ),
    scell AS (
      SELECT s.s_suppkey, s.sx, s.sy,
             s.sx // {GEO_RADIUS} AS gx,
             s.sy // {GEO_RADIUS} AS gy
      FROM supp s
    ),
    pairs AS (
      SELECT p.c_mktsegment, p.c_custkey,
             (p.cx - s.sx) * (p.cx - s.sx)
               + (p.cy - s.sy) * (p.cy - s.sy) AS d2
      FROM probe p JOIN scell s USING (gx, gy)
      WHERE (p.cx - s.sx) * (p.cx - s.sx)
              + (p.cy - s.sy) * (p.cy - s.sy)
            <= {GEO_RADIUS * GEO_RADIUS}
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT c_custkey) AS n_customers,
           MIN(d2) AS min_d2
    FROM pairs
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("geo", "join", "blocking"),
)
def q344_geo_cell_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-blocked spatial distance join: customer↔supplier pairs
    within radius R on an integer micro-degree grid, summarized per
    market segment. The 100 TB shape: each probe point explodes to its
    3×3 cell neighborhood (bounded fan-out 9, cell size = R so the
    disc is fully covered), candidates come from a hash equi-join on
    (gx, gy) with the small supplier side broadcast, and the exact
    d² ≤ R² predicate runs in codegen on the joined rows — candidate
    count scales with point density, never O(|C|·|S|). Pure 64-bit
    integer arithmetic end-to-end (squares of micro-coordinates exceed
    int32 — both sides compute in BIGINT), so the oracle hash-matches
    bit-for-bit. Edge cells simply have fewer neighbors (plane, not
    torus) — identically on both sides."""
    cust = _customers_xy(spark, sf_dir)
    supp = _suppliers_xy(spark, sf_dir)

    offsets = F.expr(
        "flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    probe = (
        cust.select("*", F.explode(offsets).alias("o"))
        .select(
            "c_custkey",
            "c_mktsegment",
            "cx",
            "cy",
            (F.expr(f"cx div {GEO_RADIUS}") + F.col("o.dx")).alias("gx"),
            (F.expr(f"cy div {GEO_RADIUS}") + F.col("o.dy")).alias("gy"),
        )
    )
    scell = supp.select(
        "s_suppkey",
        "sx",
        "sy",
        F.expr(f"sx div {GEO_RADIUS}").alias("gx"),
        F.expr(f"sy div {GEO_RADIUS}").alias("gy"),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    pairs = (
        probe.join(F.broadcast(scell), ["gx", "gy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(GEO_RADIUS * GEO_RADIUS))
    )
    return (
        pairs.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.min("d2").alias("min_d2"),
        )
        .orderBy("c_mktsegment")
    )


#: q345 query point (degrees) — mid-latitude, away from the antimeridian.
QUERY_LAT = 12.5
QUERY_LON = -33.25
KNN_K = 10


def _q345_oracle() -> str:
    """DuckDB twin of q345 — the same det-trig expression trees
    (functions/detmath.py det_sin/det_cos/det_asin), CTE-staged so each
    kernel's argument is a short column name (the kernels repeat their
    argument ~20x in the Horner text)."""
    from ent_fins_lakehouse_spark.functions.detmath import (
        DET_PI,
        det_asin_sql,
        det_cos_sql,
        det_sin_sql,
    )

    # CAST the degree constants to DOUBLE: DuckDB otherwise parses
    # both factors as DECIMAL and overflows the decimal multiply
    rad1 = f"((CAST({QUERY_LAT} AS DOUBLE) * {DET_PI}) / 180.0)"
    lon1 = f"((CAST({QUERY_LON} AS DOUBLE) * {DET_PI}) / 180.0)"
    return f"""
    WITH xy AS (
      SELECT c_custkey, c_mktsegment,
             (CAST(c_custkey AS BIGINT) * 48271) % {GRID_SPAN} AS cx,
             (CAST(c_custkey AS BIGINT) * 16807) % {GRID_SPAN} AS cy
      FROM customer
    ),
    deg AS (
      SELECT c_custkey, c_mktsegment,
             ((CAST(cy AS DOUBLE) / {float(GRID_SPAN)}) * 120.0 - 60.0) AS lat,
             ((CAST(cx AS DOUBLE) / {float(GRID_SPAN)}) * 360.0 - 180.0) AS lon
      FROM xy
    ),
    rad AS (
      SELECT *, ((lat * {DET_PI}) / 180.0) AS latr,
                ((lon * {DET_PI}) / 180.0) AS lonr
      FROM deg
    ),
    halves AS (
      SELECT *, ((latr - {rad1}) / 2.0) AS dlat2,
                ((lonr - {lon1}) / 2.0) AS dlon2
      FROM rad
    ),
    trig AS (
      SELECT *, {det_sin_sql('dlat2')} AS sdlat,
                {det_sin_sql('dlon2')} AS sdlon,
                {det_cos_sql('latr')} AS clat
      FROM halves
    ),
    hav AS (
      SELECT *, ((sdlat * sdlat)
                 + (({det_cos_sql(rad1)} * clat) * (sdlon * sdlon))) AS h
      FROM trig
    )
    SELECT c_custkey, c_mktsegment, lat, lon,
           ((2.0 * 6371.0) * {det_asin_sql('sqrt(h)')}) AS dist_km
    FROM hav
    ORDER BY dist_km, c_custkey LIMIT {KNN_K}
    """


@query(
    "q345_haversine_knn",
    oracle=_q345_oracle(),
    tags=("geo", "topk"),
)
def q345_haversine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest customers to a fixed query point by haversine
    great-circle distance. Micro-coordinates map to lat ∈ [-60, 60),
    lon ∈ [-180, 180); the ranking is `ORDER BY dist LIMIT k`, which
    Spark physically executes as TakeOrderedAndProject: each partition
    keeps a local k-row heap and the driver merges k·partitions rows —
    no global sort shuffle, flat at any corpus size.

    libm trig is not bit-portable across engines (the SCALING.md
    rounding-caveat class that kept this query rows-only through r10),
    so the trig runs on the detmath kernels instead: fixed truncated
    series over exactly-specified IEEE ops, the same expression tree
    emitted to Spark (Column algebra, whole-stage codegen) and DuckDB
    (SQL text) — bit-identical, hence oracle-checkable. det_asin is
    strictly monotonic, so the top-k SET equals the exact haversine
    top-k even where the series is least accurate;
    `tests/test_geo.py::test_haversine_knn_matches_numpy` pins values
    against a NumPy reference in the emitted (small-angle) regime."""
    from ent_fins_lakehouse_spark.functions.detmath import (
        DET_PI,
        det_asin,
        det_cos,
        det_sin,
    )

    pi = F.lit(float(DET_PI))
    cust = _customers_xy(spark, sf_dir)
    lat = (F.col("cy").cast("double") / F.lit(float(GRID_SPAN))) * F.lit(120.0) - F.lit(60.0)
    lon = (F.col("cx").cast("double") / F.lit(float(GRID_SPAN))) * F.lit(360.0) - F.lit(180.0)
    staged = (
        cust.withColumn("lat", lat)
        .withColumn("lon", lon)
        .withColumn("latr", (F.col("lat") * pi) / F.lit(180.0))
        .withColumn("lonr", (F.col("lon") * pi) / F.lit(180.0))
        .withColumn("dlat2", (F.col("latr") - (F.lit(QUERY_LAT) * pi) / F.lit(180.0)) / F.lit(2.0))
        .withColumn("dlon2", (F.col("lonr") - (F.lit(QUERY_LON) * pi) / F.lit(180.0)) / F.lit(2.0))
        .withColumn("sdlat", det_sin(F.col("dlat2")))
        .withColumn("sdlon", det_sin(F.col("dlon2")))
        .withColumn("clat", det_cos(F.col("latr")))
        .withColumn(
            "h",
            (F.col("sdlat") * F.col("sdlat"))
            + (
                (det_cos((F.lit(QUERY_LAT) * pi) / F.lit(180.0)) * F.col("clat"))
                * (F.col("sdlon") * F.col("sdlon"))
            ),
        )
        .withColumn("dist_km", F.lit(2.0 * 6371.0) * det_asin(F.sqrt(F.col("h"))))
    )
    return (
        staged.select("c_custkey", "c_mktsegment", "lat", "lon", "dist_km")
        .orderBy("dist_km", "c_custkey")
        .limit(KNN_K)
    )
