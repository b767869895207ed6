"""Batch relational queries (SURVEY.md §2.2-§2.7).

Each query exercises one operator family from the reference inventory
over the driver's TPC-H-ish tables, expressed with the idiomatic
DataFrame API (or ``spark.sql`` where the reference's entry point is
SQL, cf. `Instructor/02- Databricks_SQL_Scripts.sql`). Catalyst handles
pushdown/pruning/join selection; small dimensions get explicit
``F.broadcast`` hints so the plan stays shuffle-free where it can.

Scale notes (100 TB design): every aggregate here is partial+final
(map-side combine); joins against region/nation/supplier/part are
broadcast; the only unavoidable shuffles are on high-cardinality group
keys and the customer⋈orders⋈lineitem equi-joins, which AQE re-plans
(coalesce + skew split) at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ent_fins_lakehouse_spark.functions.numeric import (
    CHARGE_SQL,
    REVENUE_SQL,
    charge_expr,
    davg,
    dec,
    dsum,
    money,
    revenue_expr,
)
from ent_fins_lakehouse_spark.plans.llm_queries import _swap_persist
from ent_fins_lakehouse_spark.plans.registry import query
from ent_fins_lakehouse_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Scans + filter + multi-aggregate + sort (S*, P*, A*, O1)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(l_quantity)) AS avg_qty,
           (CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(l_discount)) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary — scan → pushed filter
    → 7-aggregate hash agg → total sort. The shape of the reference's
    gold-table BI aggregations (`02- Databricks_SQL_Scripts.sql:23-29`)
    at TPC-H richness."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = revenue_expr()
    charge = charge_expr()
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: 3-way equi-join with
    pushed filters on every input, aggregate, ordered LIMIT (Spark
    plans TakeOrderedAndProject — no global sort materialized)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    revenue = revenue_expr()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q03_regional_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg"),
)
def q03_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join. Dimension chain region→nation→
    supplier is broadcast end-to-end; only the fact-fact joins shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = revenue_expr()
    dims = F.broadcast(
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dims, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Filters / projections / scalar expressions (P-series)
# ---------------------------------------------------------------------------


@query(
    "q04_filter_isin",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("filter",),
)
def q04_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (P3 — reference `01-Fraud-Delta.py:63`
    ``isin(["Default","Charged Off","Fully Paid"])``) + grouped agg."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"]))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy("o_orderstatus")
    )


@query(
    "q05_global_agg",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    """,
    tags=("agg",),
)
def q05_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (keyless) aggregation — A3, reference
    `02- Databricks_SQL_Scripts.sql:15-18` SELECT SUM/COUNT — plus
    distinct-count extension."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        dsum("l_extendedprice").alias("sum_price"),
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )


@query(
    "q06_multikey_count",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(o_orderkey) AS n
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("agg",),
)
def q06_multikey_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key grouped count(col) — A5, reference
    `02- Databricks_SQL_Scripts.sql:34-41` (addr_state ×
    verification_status), via the SQL entry point (EP2)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(o_orderkey) AS n
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@query(
    "q07_derived_columns",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS FLOAT) AS price_f,
           CAST(FLOOR(CAST(o_totalprice AS DECIMAL(12,2)) / 1000) AS INTEGER) * 1000 AS price_k,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(4,2)), 2) AS DOUBLE) AS charge,
           CAST(o_orderstatus <> 'F' AS VARCHAR) AS open_flag,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("project",),
)
def q07_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withColumn chain — P5-P9: cast to float (`01-Fraud-Delta.py:
    69-70`), bucket arithmetic (`03-Fraud-ML.py:66` loan_amnt_k),
    round (`01-Fraud-Delta.py:258`), !=→string flag (`:64` bad_loan),
    year extraction (`:71-72`)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 500)
        .withColumn("price_f", F.col("o_totalprice").cast("float"))
        .withColumn("price_k", F.floor(F.col("o_totalprice").cast("decimal(12,2)") / 1000).cast("int") * 1000)
        .withColumn("charge", F.round(F.col("o_totalprice").cast("decimal(12,2)") * F.lit(1.1).cast("decimal(4,2)"), 2).cast("double"))
        .withColumn("open_flag", (F.col("o_orderstatus") != "F").cast("string"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .select("o_orderkey", "price_f", "price_k", "charge", "open_flag", "o_year")
        .orderBy("o_orderkey")
    )


@query(
    "q08_string_functions",
    oracle="""
    SELECT p_partkey,
           TRIM(REGEXP_REPLACE(p_type, '[ ]*ECONOMY|PROMO', '')) AS type_clean,
           SUBSTRING(p_brand, 7, 2) AS brand_num,
           UPPER(p_name) AS name_upper,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           LENGTH(p_name) AS name_len
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
    tags=("string",),
)
def q08_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex functions — F1 regexp_replace (`01-Fraud-Delta.py:
    69-70,78-80`), F2 substring (`:71-72`), F3 trim (`:78-80`), plus
    upper/concat/length extension surface."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.trim(F.regexp_replace("p_type", "[ ]*ECONOMY|PROMO", "")).alias("type_clean"),
            F.substring("p_brand", 7, 2).alias("brand_num"),
            F.upper("p_name").alias("name_upper"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.length("p_name").alias("name_len"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Joins (J-family: inner above; semi / anti / outer here)
# ---------------------------------------------------------------------------


@query(
    "q09_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having an open order."""
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q11_outer_join",
    oracle="""
    SELECT n_name, COALESCE(x.n, 0) AS n_customers
    FROM nation LEFT JOIN (
        SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey
    ) x ON n_nationkey = x.c_nationkey
    ORDER BY n_name
    """,
    tags=("join",),
)
def q11_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join with null-fill: nations with zero customers kept.
    Aggregate-then-join (smaller build side) rather than join-then-agg."""
    nation = load_table(spark, sf_dir, "nation")
    counts = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count("*").alias("n"))
    return (
        nation.join(counts, nation.n_nationkey == counts.c_nationkey, "left")
        .select("n_name", F.coalesce(F.col("n"), F.lit(0)).alias("n_customers"))
        .orderBy("n_name")
    )


@query(
    "q12_broadcast_dim_join",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("join", "agg"),
)
def q12_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup through two broadcast dimensions — the
    shuffle-free join shape that must survive a 100 TB fact table."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------


@query(
    "q13_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
      UNION
      SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
    ) ORDER BY nationkey
    """,
    tags=("setop",),
)
def q13_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer and supplier nation keys."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@query(
    "q14_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def q14_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both a finished and an open order."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o).orderBy("o_custkey")


@query(
    "q15_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY c_custkey
    """,
    tags=("setop",),
)
def q15_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who never had a finished order."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(f.distinct()).distinct().orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Sorts / limits / windows (§2.6 + extension)
# ---------------------------------------------------------------------------


@query(
    "q16_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort",),
)
def q16_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + LIMIT (O1 + extension). Spark plans
    TakeOrderedAndProject: per-partition top-k then merge — no full
    sort at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q17_window_topk",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window",),
)
def q17_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window — the scalable top-k
    idiom (single shuffle on the partition key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q18_window_running_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(12,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           CAST(LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS VARCHAR)
             AS prev_type
    FROM events
    ORDER BY user_id, event_id
    """,
    tags=("window",),
)
def q18_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag over an event stream ordered by time."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(dec("value")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("double").alias("running_value"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# Grouping sets / pivot (extension per SURVEY §2.4 note)
# ---------------------------------------------------------------------------


@query(
    "q19_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg",),
)
def q19_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (subtotal + grand total rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@query(
    "q20_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg",),
)
def q20_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "q21_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def q21_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list keeps the
    plan one-pass; without it Spark runs an extra distinct job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Events: JSON + time bucketing (driver `events` table; EP3' shape in batch)
# ---------------------------------------------------------------------------


@query(
    "q22_events_json",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(props->>'$.k' AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "agg"),
)
def q22_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` payload
    (the streaming-JSON shape of `Auto Loader demo.py:72` as a batch
    column op) and aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
            dsum("value").alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query(
    "q23_events_hourly",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("window", "agg", "events"),
)
def q23_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over event time via ``F.window`` —
    the batch twin of the streaming windowed agg (SURVEY §2.9
    extension). Output keyed by window start (string for a stable
    cross-engine hash)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("hour_start", "event_type")
    )


@query(
    "q24_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("window", "events"),
)
def q24_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap → cumulative session id → per-session
    rollup. One shuffle on user_id serves both windows and the final
    aggregation."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id", "session_id")
    )


@query(
    "q25_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS INTEGER) AS c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
    tags=("dedup",),
)
def q25_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash-aggregate dedup)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select("c_mktsegment", F.col("c_nationkey").cast("int").alias("c_nationkey"))
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@query(
    "q26_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts AS vts, value AS view_value FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           STRFTIME(v.vts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
           v.view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.vts
    ORDER BY p.event_id
    """,
    tags=("join", "temporal", "events"),
)
def q26_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (the tick-data staple Spark lacks natively):
    for each purchase, the user's most recent prior view. One shuffle
    on user_id via the union+ordered-window rewrite
    (operators/temporal.py) — oracle is DuckDB's native ASOF JOIN."""
    from ent_fins_lakehouse_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("value").alias("view_value")
    )
    res = asof_join(purchases, views, on=["user_id"], left_ts="ts", right_ts="vts",
                    value_cols=["view_value"])
    return res.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("matched_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("view_ts"),
        "view_value",
    ).orderBy("event_id")


@query(
    "q27_range_join",
    oracle="""
    WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'),
         e AS (SELECT user_id, ts AS ets FROM events WHERE event_type = 'error')
    SELECT s.event_id, s.user_id, COUNT(*) AS n_errors
    FROM s JOIN e
      ON s.user_id = e.user_id
     AND e.ets >= s.ts AND e.ets <= s.ts + INTERVAL 1 HOUR
    GROUP BY s.event_id, s.user_id
    ORDER BY s.event_id
    """,
    tags=("join", "temporal", "events"),
)
def q27_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band/range join: errors within 1h after each signup, per user.
    Interval-bucketing rewrite (equi-join on (user, time-bin) with
    fan-out 2 + exact band filter) instead of the quadratic inequality
    join — the rewrite Catalyst doesn't do automatically."""
    from ent_fins_lakehouse_spark.operators.temporal import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("ets")
    )
    pairs = range_join_bucketed(
        signups, errors, on=["user_id"], left_ts="ts", right_ts="ets",
        lower_seconds=0, upper_seconds=3600,
    )
    return (
        pairs.groupBy("event_id", "user_id")
        .agg(F.count("*").alias("n_errors"))
        .orderBy("event_id")
    )


@query(
    "q28_distinct_agg",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(DISTINCT EXTRACT(year FROM o_orderdate)) AS n_years,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("agg",),
)
def q28_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) aggregation (Expand-based two-phase distinct
    aggregation — extension beyond the reference's plain aggs)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.countDistinct(F.year("o_orderdate")).alias("n_years"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q29_grouping_sets",
    oracle="""
    SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), (c_mktsegment, o_orderpriority))
    ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "sql"),
)
def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL entry point (EP2) — single Expand +
    one aggregation pass instead of unioned re-scans."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), (c_mktsegment, o_orderpriority))
        ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@query(
    "q36_complex_predicate_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 5 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 10 AND l_quantity <= 40)
    """,
    tags=("predicate", "join", "agg"),
)
def q36_complex_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs multi-table predicate. The part
    side of each disjunct is pushable to the broadcast build; the
    mixed l/p residual evaluates post-join in codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    d1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20)
    d2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(5, 30)
    d3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(10, 40)
    rev = F.sum(dec("l_extendedprice", 2) * (1 - dec("l_discount", 2))).cast("double")
    return j.filter(d1 | d2 | d3).agg(rev.alias("revenue"))


@query(
    "q37_conditional_agg_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
           100.0 * CAST(SUM(CASE WHEN p_type LIKE 'ECONOMY%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                 ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS economy_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("agg", "predicate"),
)
def q37_conditional_agg_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: CASE-WHEN conditional aggregation (promo
    revenue share) — one pass, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice", 2) * (1 - dec("l_discount", 2))
    cond = F.when(F.col("p_type").like("ECONOMY%"), rev).otherwise(F.lit(0).cast("decimal(25,4)"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg((F.lit(100.0) * F.sum(cond).cast("double") / F.sum(rev).cast("double")).alias("economy_share_pct"))
        .orderBy("ship_year")
    )


@query(
    "q38_bilateral_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE sn.n_name < cn.n_name
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("join", "agg"),
)
def q38_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two independent dimension chains (supplier
    nation, customer nation) hanging off the fact — both chains
    broadcast; the only shuffles are fact⋈orders and the final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    vol = F.sum(dec("l_extendedprice", 2) * (1 - dec("l_discount", 2))).cast("double")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.count("*").alias("n_lines"), vol.alias("volume"))
        .orderBy("supp_nation", "cust_nation")
    )


@query(
    "q39_rich_idle_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("join", "subquery", "agg"),
)
def q39_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + anti join
    (customers with no high-value order). The average stays IN the
    plan as a one-row broadcast cross join rather than a driver-side
    collect (VERDICT r2 anti-pattern #3) — one lazy plan, no job
    barrier, and the whole query still optimizes as a unit."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    big = orders.filter(F.col("o_totalprice") > 300000)
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(big, cust["c_custkey"] == big["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_custs"), dsum("c_acctbal", 2).alias("total_bal"))
        .orderBy("c_mktsegment")
    )


@query(
    "q49_exact_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "events"),
)
def q49_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (`percentile`, the
    sort-based exact aggregate) — the distribution-profiling primitive;
    the approximate path (`percentile_approx`/KLL at 100 TB, where the
    exact sort is the bottleneck) is covered rows-only in unit tests
    with error bounds."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.lit([0.25, 0.50, 0.75]))
    return (
        ev.groupBy("event_type")
        .agg(
            pct.getItem(0).alias("p25"),
            pct.getItem(1).alias("p50"),
            pct.getItem(2).alias("p75"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .orderBy("event_type")
    )


@query(
    "q69_window_suite",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
    tags=("window",),
)
def q69_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions beyond rank/sum: lag, lead, ntile,
    percent_rank, cume_dist over one per-customer ordered window — a
    single shuffle on the partition key serves all five."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("o_custkey", F.col("prev_price").asc_nulls_first(), "o_orderkey")
    )


@query(
    "q78_array_agg",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(array_agg(DISTINCT o_orderpriority)), '|') AS priorities,
           COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("agg", "array"),
)
def q78_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_set sorted for a deterministic value
    hash (collect_list/collect_set ordering is partitioning-dependent —
    sort_array is the portable contract). The sorted array is serialized
    with array_join on both sides because the driver's pandas-based
    canonicalizer cannot sort/hash list-valued cells."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q79_rolling_time_window",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_prev_hour,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) AS sum_prev_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("window", "temporal", "events"),
)
def q79_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (not row-count): per-user rolling
    1-hour count/sum over event time — the feature-engineering shape
    for transaction velocity checks. Spark expresses range frames over
    timestamps via rangeBetween on the epoch seconds ordering."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)  # 1 hour in microseconds
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_prev_hour"),
            F.sum(dec("value")).over(w).cast("double").alias("sum_prev_hour"),
        )
        .orderBy("event_id")
    )


@query(
    "q80_fuzzy_entity_match",
    oracle="""
    WITH probes AS (
      SELECT c_custkey AS probe_id,
             CONCAT(SUBSTRING(c_name, 1, 2), SUBSTRING(c_name, 4, LENGTH(c_name))) AS probe_name,
             c_nationkey
      FROM customer WHERE c_custkey % 150 = 0
    )
    SELECT p.probe_id, c.c_custkey AS matched_id,
           levenshtein(p.probe_name, c.c_name) AS dist
    FROM probes p JOIN customer c
      ON p.c_nationkey = c.c_nationkey
    WHERE levenshtein(p.probe_name, c.c_name) <= 1
    ORDER BY probe_id, matched_id
    """,
    tags=("join", "fuzzy", "dedup"),
)
def q80_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity linking by edit distance: a probe list of corrupted
    names (one character dropped) fuzzy-joined back to the master
    table — nation blocking bounds the candidates, the small probe
    side broadcasts, Levenshtein ≤ 1 verifies. Linear in the master
    table; the all-pairs variant is the near-dup family's job."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    probes = cust.filter(F.col("c_custkey") % 150 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.concat(
            F.substring("c_name", 1, 2),
            F.expr("substring(c_name, 4, length(c_name))"),
        ).alias("probe_name"),
        F.col("c_nationkey").alias("nk"),
    )
    dist = F.levenshtein("probe_name", "c_name")
    return (
        F.broadcast(probes)
        .join(cust, probes["nk"] == cust["c_nationkey"])
        .select("probe_id", F.col("c_custkey").alias("matched_id"), dist.alias("dist"))
        .filter(F.col("dist") <= 1)
        .orderBy("probe_id", "matched_id")
    )


@query(
    "q81_deterministic_sample",
    oracle="""
    WITH s AS (
      SELECT * FROM orders
      WHERE CAST(('0x' || SUBSTRING(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0
    )
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM s GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("sample", "agg"),
)
def q81_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample by key hash (md5 bucket), not
    seed+partition-dependent Bernoulli: the reproducible sampling a
    training pipeline needs — same rows on any engine, any cluster
    size, any run. Filter is a pure row-local expression (fused into
    the scan); the aggregate proves the same rows were chosen."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 5
    return (
        orders.filter(bucket == 0)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("o_totalprice", 2)).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q82_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             (CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(l_quantity)) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / CAST(7 AS DOUBLE) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part_avg USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
    tags=("subquery", "join", "agg"),
)
def q82_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a broadcast aggregate join — the
    Spark-first plan for `WHERE x < (SELECT 0.2*avg(..) WHERE same
    part)`. The per-part avg is ~|part| rows, broadcastable at any SF;
    both engines compute the threshold with the identical decimal-sum/
    count double division, so the boundary comparison is bit-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(davg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice", 2) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q83_priority_exists_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("subquery", "exists", "sql", "agg"),
)
def q83_priority_exists_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS + aggregate, entered through
    the SQL surface (`spark.sql` over registered views — the
    reference's EP2 path, `02- Databricks_SQL_Scripts.sql`). Catalyst
    rewrites the EXISTS into a left-semi hash join; the date filter is
    pushed to the orders scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q84_cheapest_supplier_per_part",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) AS unit_cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    )
    SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey, s_name, c.unit_cost
    FROM cost c JOIN supplier ON c.l_suppkey = s_suppkey
    WHERE c.unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                         WHERE c2.l_partkey = c.l_partkey)
    ORDER BY p_partkey, s_suppkey
    """,
    tags=("subquery", "join"),
)
def q84_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table — unit cost derived
    from lineitem): per-part correlated MIN subquery, decorrelated into
    a per-part min aggregate + equality join-back. Both engines derive
    unit_cost with the same IEEE double division over the same rows, so
    the min and the equality match bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    cost = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double")
            ).alias("unit_cost")
        )
    )
    part_min = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        cost.join(F.broadcast(part_min), "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(supp), cost["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "unit_cost",
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "q85_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "outer"),
)
def q85_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a left outer join —
    customers with zero orders must survive as c_count=0. Two-level
    aggregation; the second groupBy is tiny (distinct counts), so the
    only real shuffle is the c_custkey one, which AQE coalesces."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q86_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("subquery", "having", "join", "agg"),
)
def q86_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered IN subquery (big orders by total
    quantity) joined back to customer/orders. The textbook plan scans
    lineitem twice (once for the HAVING key set, once to re-aggregate
    per surviving order); here the HAVING aggregate IS the per-order
    quantity sum, so one lineitem scan + one shuffle produces both the
    filter and sum_qty, and the tiny survivor set broadcasts into
    orders⋈customer. Deterministic LIMIT via (o_totalprice,
    o_orderkey) total order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q87_returned_item_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q87_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: lost-revenue ranking — 4-table join with the
    l_returnflag filter pushed to the lineitem scan, nation broadcast,
    deterministic top-20 via (revenue, c_custkey). Revenue is exact
    decimal on both engines so the DESC order has no float ties."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q88_nation_market_share",
    oracle="""
    SELECT order_year,
           CAST(CAST(SUM(CASE WHEN n_name = 'NATION_7' THEN rev
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(SUM(rev) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS order_year, n_name,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    )
    GROUP BY order_year
    ORDER BY order_year
    """,
    tags=("join", "agg", "conditional"),
)
def q88_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of supplier revenue per order
    year — conditional aggregation over a 4-table join. Numerator and
    denominator stay exact decimal until one final double division
    (identical IEEE op both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = revenue_expr().cast("decimal(18,4)")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select(
            F.year("o_orderdate").alias("order_year"),
            "n_name",
            rev.alias("rev"),
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        joined.groupBy("order_year")
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_7", F.col("rev")).otherwise(zero)).cast("double")
                / F.sum("rev").cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("order_year")
    )


@query(
    "q89_salted_skew_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "skew"),
)
def q89_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join (operators/skew.py salted_join): the
    left side's rows are spread over N salts and the right side is
    replicated N×, so one hot key occupies N reducers instead of one.
    Result-identical to the plain join — the oracle IS the plain join —
    which is the operator's contract (beyond-AQE manual skew tool for
    when runtime split isn't available, e.g. streaming-static joins)."""
    from ent_fins_lakehouse_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    return (
        salted_join(li, orders.select("l_orderkey", "o_orderpriority"), ["l_orderkey"], num_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_extendedprice").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q90_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "approx"),
)
def q90_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregation: HyperLogLog++ approx_count_distinct next to
    the exact distinct count per event_type. At 100 TB the sketch is
    the only viable distinct count — one pass, constant memory,
    mergeable partials.

    Hash-checkable formulation (VERDICT r2 item 3): the engine-specific
    HLL estimate is folded into ``within_bound = rel_err <= 0.05``, a
    deterministic boolean the DuckDB oracle reproduces as literal TRUE
    (the estimate itself would differ across engines; the bound claim
    must not). tests/test_approx.py still asserts the tighter
    rsd-derived error bound on the raw estimate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users").cast("double")
                <= F.lit(0.05)
            ).alias("within_bound"),
        )
        .orderBy("event_type")
    )


@query(
    "q94_date_functions",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS o_year,
           EXTRACT(month FROM o_orderdate) AS o_month,
           EXTRACT(day FROM o_orderdate) AS o_day,
           CAST(EXTRACT(dow FROM o_orderdate) + 1 AS BIGINT) AS o_dow,
           EXTRACT(quarter FROM o_orderdate) AS o_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS BIGINT) AS days_to_ref,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
    tags=("functions", "temporal"),
)
def q94_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar-function parity suite: extract family,
    date_trunc, day difference, and strftime-style formatting — the
    idiomatic replacements for the reference's substring-on-string date
    handling (`01-Fraud-Delta.py:71-72` extracts year with
    substring(issue_d, 5, 4)). Engine-mapping notes: Spark dayofweek is
    1=Sunday, DuckDB dow is 0=Sunday (+1 aligns); datediff(end, start)
    argument order matches DuckDB date_diff('day', start, end)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
            F.dayofweek("o_orderdate").cast("long").alias("o_dow"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.datediff(
                F.lit("1998-12-31").cast("timestamp"), F.col("o_orderdate")
            ).cast("long").alias("days_to_ref"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q96_date_spine_gap_fill",
    oracle="""
    WITH spine AS (
      SELECT CAST(d AS DATE) AS day
      FROM generate_series(DATE '1995-01-01', DATE '1995-06-30',
                           INTERVAL 1 DAY) AS t(d)
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-07-01'
      GROUP BY 1
    )
    SELECT s.day,
           COALESCE(d.n, 0) AS n_orders,
           CAST(CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY s.day
    """,
    tags=("functions", "temporal", "gap-fill"),
)
def q96_date_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: generate a dense day spine with
    ``sequence`` + ``explode`` (DuckDB generate_series), left-join the
    per-day order counts, and zero-fill missing days — the standard
    time-series densification step the reference's dashboards assume
    (`02- Databricks_SQL_Scripts.sql` charts group-by-day data).
    Scale note: the spine is tiny (one row per day) so Spark
    broadcasts it; the fact side aggregates map-side before the join."""
    orders = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-06-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
        )
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_orders"),
            F.col("n").isNull().cast("long").alias("is_gap"),
        )
        .orderBy("day")
    )


@query(
    "q97_stat_functions",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_s,
           round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_p,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(var_pop(l_quantity), 4) AS varp_qty,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregation", "statistics"),
)
def q97_stat_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate suite (SURVEY §2.4 extension): correlation,
    sample/population covariance and variance, stddev, and the
    regr_* linear-regression family — all JVM-side Catalyst aggregates
    with map-side partial merge (no shuffle of raw rows beyond the
    group-by). Rounding is scaled to each statistic's magnitude so the
    float merge order across 32 partitions cannot flip a digit."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(p, q).cast("long").alias("n"),
            F.round(F.corr(q, p), 6).alias("corr_qp"),
            F.round(F.covar_samp(q, p), 2).alias("covar_s"),
            F.round(F.covar_pop(q, p), 2).alias("covar_p"),
            F.round(F.stddev_samp(p), 2).alias("sd_price"),
            F.round(F.var_samp(q), 4).alias("var_qty"),
            F.round(F.var_pop(q), 4).alias("varp_qty"),
            F.round(F.regr_slope(p, q), 4).alias("slope"),
            F.round(F.regr_intercept(p, q), 2).alias("icept"),
            F.round(F.regr_r2(p, q), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q98_moment_skew_kurtosis",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skew_pop,
           round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS kurt_pop
    FROM sums
    ORDER BY l_returnflag
    """,
    tags=("aggregation", "statistics"),
)
def q98_moment_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness / excess kurtosis pinned through exact
    DECIMAL moment sums (the same float-determinism discipline as the
    revenue aggregates): per-row double powers are cast to
    DECIMAL(38,6), summed exactly (order-insensitive), and the moment
    formulas evaluate in double identically on both engines. Spark's
    built-in ``skewness``/``kurtosis`` use this population definition
    while DuckDB's use the sample-adjusted one, so the raw built-ins
    intentionally diverge — tests/test_relational_extra.py asserts the
    built-ins agree with these pinned values to 1e-3."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec(x, 6)).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("s2"),
        F.sum((x * x * x).cast("decimal(38,6)")).cast("double").alias("s3"),
        F.sum((x * x * x * x).cast("decimal(38,6)")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    skew = (s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu) / F.pow(m2, 1.5)
    kurt = (s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu) / F.pow(m2, 2) - 3
    return (
        sums.select(
            "l_returnflag",
            F.round(skew, 6).alias("skew_pop"),
            F.round(kurt, 6).alias("kurt_pop"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q99_regex_suite",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, 'table')) AS BIGINT) AS n_table,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END AS BIGINT) AS has_spark,
           CAST(levenshtein(regexp_extract(text, '^([a-z]+)', 1), 'table') AS BIGINT) AS lev_to_table,
           replace(regexp_extract(text, '^([a-z]+ [a-z]+)', 1), ' ', '_') AS bigram_key
    FROM documents
    WHERE doc_id % 101 = 0
    ORDER BY doc_id
    """,
    tags=("functions", "string", "regex"),
)
def q99_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex / string scalar-function parity suite (SURVEY §2.3 — the
    reference's regexp_replace/substring/trim family F1-F3 generalized):
    anchored extract, extract-all count, split tokenization, rlike,
    levenshtein distance, and replace. All whole-stage-codegen JVM
    expressions; the predicate prunes on doc_id before any regex runs."""
    docs = load_table(spark, sf_dir, "documents")
    first_word = F.regexp_extract("text", r"^([a-z]+)", 1)
    return (
        docs.filter(F.col("doc_id") % 101 == 0)
        .select(
            "doc_id",
            first_word.alias("first_word"),
            F.size(F.regexp_extract_all("text", F.lit("table"), 0)).cast("long").alias("n_table"),
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            F.col("text").rlike("spark").cast("long").alias("has_spark"),
            F.levenshtein(first_word, F.lit("table")).cast("long").alias("lev_to_table"),
            F.replace(
                F.regexp_extract("text", r"^([a-z]+ [a-z]+)", 1), F.lit(" "), F.lit("_")
            ).alias("bigram_key"),
        )
        .orderBy("doc_id")
    )


@query(
    "q100_hash_string_suite",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           CAST(length(c_name) AS BIGINT) AS name_len,
           reverse(c_name) AS name_rev,
           concat_ws('|', c_name, c_mktsegment) AS name_seg,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_pad,
           upper(c_mktsegment) AS seg_upper,
           substring(c_name, 1, 8) AS name_head
    FROM customer
    WHERE c_custkey % 251 = 0
    ORDER BY c_custkey
    """,
    tags=("functions", "string", "hash"),
)
def q100_hash_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hashing + string-shaping suite: md5 / sha2-256
    content fingerprints (the engine-portable hash family — xxhash64 and
    crc32 exist in Spark but are engine-specific, so the portable subset
    is what cross-system pipelines should key on), plus
    length/reverse/concat_ws/lpad/upper/substring parity."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_custkey") % 251 == 0)
        .select(
            "c_custkey",
            F.md5("c_name").alias("name_md5"),
            F.sha2("c_name", 256).alias("name_sha256"),
            F.length("c_name").cast("long").alias("name_len"),
            F.reverse("c_name").alias("name_rev"),
            F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
            F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_pad"),
            F.upper("c_mktsegment").alias("seg_upper"),
            F.substring("c_name", 1, 8).alias("name_head"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q101_sole_late_supplier",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s.s_name,
           CAST(COUNT(DISTINCT f.l_orderkey) AS BIGINT) AS numwait
    FROM flagged f
    JOIN per_order p ON f.l_orderkey = p.l_orderkey
    JOIN supplier s ON f.l_suppkey = s.s_suppkey
    WHERE f.late = 1 AND p.n_supp > 1 AND p.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    tags=("join", "tpch-shape"),
)
def q101_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) adapted to
    the testdata's columns: among finished multi-supplier orders, blame
    the supplier who was the ONLY late shipper (shipdate > orderdate +
    75 days). Single-scan plan: the per-order distinct-supplier
    counts come from ``collect_set`` windows over l_orderkey instead of
    a groupBy + join-back (which would scan lineitem and orders twice —
    at 100 TB the second fact scan IS the bottleneck); the window
    reuses the join shuffle's l_orderkey partitioning, so the whole
    rollup adds no exchange. Supplier is a broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAY"))
            .cast("int")
            .alias("late"),
        )
    )
    w = W.partitionBy("l_orderkey")
    per_line = flagged.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late",
        F.size(F.collect_set(F.when(F.col("late") == 1, F.col("l_suppkey"))).over(w)),
    )
    return (
        per_line.filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q105_unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             round(CAST(SUM(CAST(l_quantity AS DECIMAL(38, 4))) AS DOUBLE), 2) AS sum_qty,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38, 4))) AS DOUBLE), 2) AS sum_price,
             round(CAST(SUM(CAST(l_discount AS DECIMAL(38, 4))) AS DOUBLE), 2) AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, val
    FROM wide
    UNPIVOT (val FOR metric IN (sum_qty, sum_price, sum_disc))
    ORDER BY l_returnflag, metric
    """,
    tags=("reshape", "unpivot"),
)
def q105_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (``DataFrame.unpivot`` / SQL UNPIVOT): melt
    per-flag metric columns into (metric, val) rows — the inverse of
    q21's pivot. The melt is a zero-shuffle projection (each input row
    fans out to 3 output rows in place), so it composes with the
    upstream agg without adding an exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(dsum("l_quantity"), 2).alias("sum_qty"),
        F.round(dsum("l_extendedprice"), 2).alias("sum_price"),
        F.round(dsum("l_discount"), 2).alias("sum_disc"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "sum_disc"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .orderBy("l_returnflag", "metric")
    )


@query(
    "q106_argmin_argmax",
    oracle="""
    SELECT o_orderpriority,
           (min({'p': o_totalprice, 'k': o_orderkey})).k AS cheapest_key,
           (max({'p': o_totalprice, 'k': o_orderkey})).k AS dearest_key,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregation", "argminmax"),
)
def q106_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregation (``min_by``/``max_by``): which order
    was the cheapest / most expensive per priority class. The ordering
    key is a (price, orderkey) struct so ties on price break
    deterministically by key on both engines — bare min_by leaves
    tie-breaks implementation-defined, which a differential harness
    cannot accept."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderkey", key).alias("cheapest_key"),
            F.max_by("o_orderkey", key).alias("dearest_key"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q107_bitwise_agg",
    oracle="""
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS key_and,
           bit_or(o_orderkey) AS key_or,
           bit_xor(o_orderkey) AS key_xor,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregation", "bitwise"),
)
def q107_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) — exact,
    order-insensitive, commutative aggregates used for key-space
    membership sketches and parity checks; merge-friendly at any
    partition count by construction."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").alias("key_and"),
            F.bit_or("o_orderkey").alias("key_or"),
            F.bit_xor("o_orderkey").alias("key_xor"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q108_array_ops",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')[:6])), ',') AS head_vocab,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS vocab_size,
           CAST(list_contains(string_split(text, ' '), 'table') AS INT) AS has_table,
           CAST(COALESCE(list_position(string_split(text, ' '), 'table'), 0) AS BIGINT) AS table_pos,
           array_to_string(list_reverse(list_sort(list_distinct(string_split(text, ' ')[:6]))), ',') AS head_desc
    FROM documents
    WHERE doc_id % 151 = 0
    ORDER BY doc_id
    """,
    tags=("functions", "array"),
)
def q108_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set/ordering operators: slice → distinct → sort (and
    reverse-sort), distinct cardinality, membership, and first-position
    lookup over tokenized text. Spark's array_position and DuckDB's
    list_position differ on absent keys (0 vs NULL) — the oracle
    coalesces to Spark's convention, a documented engine-mapping rule."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 151 == 0)
    toks = F.split("text", " ")
    head = F.array_sort(F.array_distinct(F.slice(toks, 1, 6)))
    return docs.select(
        "doc_id",
        F.array_join(head, ",").alias("head_vocab"),
        F.size(F.array_distinct(toks)).cast("long").alias("vocab_size"),
        F.array_contains(toks, "table").cast("int").alias("has_table"),
        F.array_position(toks, "table").cast("long").alias("table_pos"),
        F.array_join(F.reverse(head), ",").alias("head_desc"),
    ).orderBy("doc_id")


@query(
    "q109_sql_cte_ranking",
    oracle="""
    WITH seg_nation AS (
      SELECT c.c_mktsegment AS segment, n.n_name AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38, 4))) AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT segment, nation, round(revenue, 2) AS revenue,
             RANK() OVER (PARTITION BY segment ORDER BY revenue DESC, nation) AS rnk
      FROM seg_nation
    )
    SELECT segment, nation, revenue, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY segment, rnk, nation
    """,
    tags=("sql", "cte", "window"),
)
def q109_sql_cte_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front end end-to-end (S4 — the reference drives most of
    its analytics through `spark.sql`, `02- Databricks_SQL_Scripts.sql`):
    register temp views, then run a multi-CTE query with joins, a
    decimal-pinned aggregate, and a window RANK — all planned by
    Catalyst identically to the DataFrame API."""
    for name in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"q109_{name}")
    return spark.sql("""
        WITH seg_nation AS (
          SELECT c.c_mktsegment AS segment, n.n_name AS nation,
                 CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38, 4))) AS DOUBLE) AS revenue
          FROM q109_orders o
          JOIN q109_customer c ON o.o_custkey = c.c_custkey
          JOIN q109_nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT segment, nation, round(revenue, 2) AS revenue,
                 RANK() OVER (PARTITION BY segment ORDER BY revenue DESC, nation) AS rnk
          FROM seg_nation
        )
        SELECT segment, nation, revenue, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 3
        ORDER BY segment, rnk, nation
    """)


@query(
    "q110_map_functions",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents WHERE doc_id % 151 = 0
    )
    SELECT doc_id,
           lang AS meta_lang,
           source AS meta_source,
           CAST(n_tokens AS BIGINT) AS meta_tokens,
           'chars,lang,source,tokens' AS meta_keys,
           CAST(4 AS INT) AS meta_size
    FROM tok
    ORDER BY doc_id
    """,
    tags=("functions", "map"),
)
def q110_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column plumbing: build a string→string metadata map
    per document (``create_map``), then read it back via element_at,
    sorted map_keys, and size. Maps are how a corpus pipeline carries
    open-schema sidecar metadata (provenance, decode params) without
    widening the table; the oracle states the expected extractions
    directly since DuckDB's MAP literals hash differently."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 151 == 0)
    meta = F.create_map(
        F.lit("lang"), F.col("lang"),
        F.lit("source"), F.col("source"),
        F.lit("chars"), F.col("n_chars").cast("string"),
        F.lit("tokens"), F.size(F.split("text", " ")).cast("string"),
    )
    return (
        docs.withColumn("meta", meta)
        .select(
            "doc_id",
            F.element_at("meta", "lang").alias("meta_lang"),
            F.element_at("meta", "source").alias("meta_source"),
            F.element_at("meta", "tokens").cast("long").alias("meta_tokens"),
            F.array_join(F.array_sort(F.map_keys("meta")), ",").alias("meta_keys"),
            F.size(F.map_keys("meta")).alias("meta_size"),
        )
        .orderBy("doc_id")
    )


@query(
    "q115_format_roundtrip",
    oracle="""
    SELECT 'csv' AS fmt, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38, 4))) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey % 7 = 0 GROUP BY o_orderpriority
    UNION ALL
    SELECT 'orc' AS fmt, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38, 4))) AS DOUBLE) AS total
    FROM orders WHERE o_orderkey % 7 = 0 GROUP BY o_orderpriority
    ORDER BY fmt, o_orderpriority
    """,
    tags=("sources", "formats"),
)
def q115_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format breadth (S1/S2/S8 generalized — the
    reference reads CSV `01-Fraud-Delta.py:37-51` and writes Delta):
    the same relation written to ORC (typed, columnar, splittable) and
    headered CSV (schema applied explicitly on read — never inferSchema
    in production: inference is a full extra pass over 100 TB and can
    mis-type sparse columns), read back, and aggregated identically
    from both."""
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="fmt_rt_")
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    orc_path, csv_path = f"{root}/orc", f"{root}/csv"
    base.write.mode("overwrite").orc(orc_path)
    base.write.mode("overwrite").option("header", True).csv(csv_path)
    orc_df = spark.read.orc(orc_path)
    csv_df = (
        spark.read.schema("o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE")
        .option("header", True)
        .csv(csv_path)
    )

    def _agg(df: DataFrame, fmt: str) -> DataFrame:
        return (
            df.groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(dec("o_totalprice")).cast("double").alias("total"),
            )
            .withColumn("fmt", F.lit(fmt))
        )

    return (
        _agg(csv_df, "csv")
        .unionByName(_agg(orc_df, "orc"))
        .select("fmt", "o_orderpriority", "n", "total")
        .orderBy("fmt", "o_orderpriority")
    )


@query(
    "q116_null_semantics",
    oracle="""
    WITH a AS (
      SELECT nullif(c_nationkey % 5, 0) AS g, c_custkey, c_acctbal FROM customer
    ),
    b AS (
      SELECT nullif(c_nationkey % 5, 0) AS g, c_custkey FROM customer
      WHERE c_custkey <= 100
    )
    SELECT COALESCE(CAST(a.g AS VARCHAR), 'none') AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(a.g) AS BIGINT) AS n_nonnull_keys,
           CAST(SUM(CASE WHEN a.c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           round(CAST(SUM(CAST(COALESCE(a.c_acctbal, 0) AS DECIMAL(38, 4))) AS DOUBLE), 2) AS total_bal
    FROM a JOIN b ON a.g IS NOT DISTINCT FROM b.g
    GROUP BY 1
    ORDER BY grp
    """,
    tags=("join", "null-semantics"),
)
def q116_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics suite: nullif manufactures NULL keys, the join
    uses null-safe equality (Spark ``<=>`` ≡ SQL IS NOT DISTINCT FROM,
    which matches NULL to NULL where ``=`` silently drops those rows),
    and the aggregate layer shows COUNT(*) vs COUNT(col) and
    COALESCE-pinned sums. Null-safe equi-joins hash-partition NULL like
    any other key value, so the plan is still a plain shuffle/broadcast
    hash join — no special casing at scale."""
    cust = load_table(spark, sf_dir, "customer")
    g = F.nullif(F.col("c_nationkey") % 5, F.lit(0))
    a = cust.select(g.alias("g"), "c_custkey", "c_acctbal")
    b = cust.filter(F.col("c_custkey") <= 100).select(g.alias("g_b"), "c_custkey")
    return (
        a.join(F.broadcast(b), a.g.eqNullSafe(b.g_b))
        .groupBy(F.coalesce(F.col("g").cast("string"), F.lit("none")).alias("grp"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.count("g").cast("long").alias("n_nonnull_keys"),
            F.sum((F.col("c_acctbal") < 0).cast("long")).alias("n_neg"),
            F.round(
                F.sum(dec(F.coalesce(F.col("c_acctbal"), F.lit(0)), 4)).cast("double"), 2
            ).alias("total_bal"),
        )
        .orderBy("grp")
    )


@query(
    "q117_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + 45 AS DATE) AS plus45d,
           CAST(EXTRACT(week FROM o_orderdate) AS BIGINT) AS iso_week,
           CAST(EXTRACT(isodow FROM o_orderdate) AS BIGINT) AS iso_dow,
           CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy
    FROM orders
    WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
    tags=("functions", "temporal"),
)
def q117_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic beyond q94: add_months (end-of-month clamped the
    same way on both engines), last_day, fixed-day offsets, ISO week /
    ISO day-of-week (Spark ``weekday`` is 0=Monday; +1 aligns with
    DuckDB isodow), and day-of-year."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.add_months(d, 3).alias("plus3m"),
            F.last_day(d).alias("month_end"),
            F.date_add(d, 45).alias("plus45d"),
            F.weekofyear(d).cast("long").alias("iso_week"),
            (F.weekday(d) + 1).cast("long").alias("iso_dow"),
            F.dayofyear(d).cast("long").alias("doy"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# TPC-H suite completion: the remaining canonical query shapes (Q5, Q9,
# Q11, Q12, Q14, Q15, Q16, Q20) adapted to the driver's star schema
# (no partsupp table — lineitem's (l_partkey, l_suppkey) is the
# part-supplier relationship; no l_shipmode/commitdate — o_orderpriority
# and shipdate-vs-orderdate lag stand in). Together with q01/q02/q82-q88/
# q101 this covers every distinct TPC-H physical shape.
# ---------------------------------------------------------------------------


@query(
    "q118_regional_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "tpch"),
)
def q118_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a local-supplier
    constraint (customer and supplier share a nation). Physical plan:
    orders⋈lineitem and the customer join are the two shuffle joins —
    customer scales with SF (a big dimension at 100 TB), so unlike
    supplier/nation/region it must NOT be broadcast; AQE may still
    choose broadcast at small SF where it fits."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q119_promo_revenue_share",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS total_revenue,
           100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL} ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
                 / CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    tags=("join", "agg", "tpch"),
)
def q119_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional aggregate ratio
    over a month of shipments. The share is divided in DOUBLE space
    from two exact decimal sums, so both engines produce the identical
    IEEE result. part is broadcast; one scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = revenue_expr()
    zero = F.lit(0).cast("decimal(12,4)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
    total = F.sum(rev).cast("double")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            promo.alias("promo_revenue"),
            total.alias("total_revenue"),
            (F.lit(100.0) * promo / total).alias("promo_share_pct"),
        )
    )


@query(
    "q120_disjunctive_predicate_revenue",
    oracle=f"""
    SELECT CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("join", "agg", "tpch"),
)
def q120_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): a disjunction of
    conjunctive brand/size/quantity predicates spanning both join
    sides. Catalyst extracts the common p_brand IN (...) / p_size
    bounds into pushable filters below the broadcast join and keeps
    the full disjunction as the post-join condition."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#5") & s.between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q121_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q121_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the max-revenue supplier(s) via a scalar aggregate compared
    against the same derived table. The scalar MAX is a one-row
    broadcast cross-join, not a window over a single partition — no
    single-reducer bottleneck at scale. Equality on the double is safe:
    both operands derive from the identical exact decimal sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(revenue_expr()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx._mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q122_supplier_cnt_by_part_attrs",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q122_supplier_cnt_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    count per part attribute triple, excluding a NOT-IN subquery of
    flagged suppliers. lineitem(l_partkey, l_suppkey) is the partsupp
    stand-in. NOT IN over a non-nullable key column is planned as a
    broadcast anti-join (s_suppkey has no NULLs — no null-semantics
    trap)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    flagged = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q123_product_profit_by_nation_year",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
           CAST(SUM({REVENUE_SQL}
                    - CAST(0.5 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,4))
               ) AS DOUBLE) AS sum_profit
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(EXTRACT(year FROM l_shipdate) AS INT)
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "tpch"),
)
def q123_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier-nation
    per ship-year for one product family. Cost is modeled as
    0.5 × p_retailprice × l_quantity (no partsupp.ps_supplycost in
    this schema). The whole profit expression stays in exact decimal
    until the final double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    half = F.lit(0.5).cast("decimal(2,1)")
    profit = revenue_expr() - half * money("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q124_important_parts",
    oracle=f"""
    WITH val AS (
      SELECT l_partkey, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS part_value
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM val
    WHERE part_value > (SELECT 0.001 * SUM(part_value) FROM val)
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q124_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part traded value
    restricted to one region's suppliers, HAVING value above a fraction
    of the global total (scalar subquery → one-row broadcast). The
    0.001 × total threshold is computed in double on both engines from
    the same exact decimal sum.

    Scale note: val is aggregated once and reused for both the total
    and the filter — Spark recomputes the subtree unless materialized.
    localCheckpoint (lazy) rather than persist: the checkpointed
    blocks are released by the ContextCleaner when the result is
    dropped, whereas a cache entry would accumulate across repeated
    invocations in a long-lived session (ADVICE r2)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(revenue_expr()).cast("double").alias("part_value"))
        .localCheckpoint(eager=False)
    )
    thresh = val.agg((F.lit(0.001) * F.sum("part_value")).alias("_t"))
    return (
        val.join(F.broadcast(thresh), val.part_value > thresh._t)
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q125_excess_volume_suppliers",
    oracle="""
    WITH red AS (
      SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS red_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red %'
      GROUP BY l_suppkey
    ),
    tot AS (
      SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, red_qty, total_qty
    FROM supplier JOIN red ON s_suppkey = red.l_suppkey
                  JOIN tot ON s_suppkey = tot.l_suppkey
    WHERE red_qty > 0.13 * total_qty
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q125_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipped volume of one product family exceeds a fraction of their
    total shipped volume — two aggregates over lineitem joined on the
    supplier key. Both quantity sums are exact decimal → double, and
    the 0.13 factor is applied in double space on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    supp = load_table(spark, sf_dir, "supplier")
    red = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("red_qty"))
    )
    tot = li.groupBy("l_suppkey").agg(dsum("l_quantity").alias("total_qty"))
    return (
        red.join(tot, "l_suppkey")
        .filter(F.col("red_qty") > F.lit(0.13) * F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "red_qty", "total_qty")
        .orderBy("s_suppkey")
    )


@query(
    "q126_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("join", "agg", "tpch"),
)
def q126_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): conditional
    priority counts over late shipments — a cross-column date-lag
    predicate (shipdate > orderdate + 90 days) that only resolves
    after the join, plus pushable shipdate bounds that prune the
    lineitem scan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Behavioral / product analytics over the events stream: funnel,
# cohort retention, and path mining — the standard clickstream shapes
# beside q23 (hourly rollup) and q24 (sessionization).
# ---------------------------------------------------------------------------


@query(
    "q131_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_then_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
    tags=("events", "funnel", "analytics"),
)
def q131_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each stage
    requires an event strictly after the user's first event of the
    previous stage. Three staged min-aggregates chained by equi-joins
    on user_id — every join key is the same, so at scale one
    repartition by user_id serves all three stages (AQE reuses the
    exchange); no window over the full event log is needed."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_then_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


@query(
    "q132_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('week', cohort_week, active_week) AS INT) AS weeks_since,
           COUNT(*) AS n_users
    FROM firsts JOIN activity USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("events", "cohort", "analytics"),
)
def q132_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week
    (both engines truncate weeks to Monday), counted in every
    subsequent week they were active. On week-truncated dates the
    day difference is an exact multiple of 7, so datediff/7 matches
    DuckDB's boundary-counting date_diff('week') losslessly."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = ev.select("user_id", F.date_trunc("week", "ts").alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("weeks_since"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@query(
    "q133_event_path_trigrams",
    oracle="""
    SELECT g, COUNT(*) AS n FROM (
      SELECT event_type || '>' || lead1 || '>' || lead2 AS g FROM (
        SELECT event_type,
               LEAD(event_type, 1) OVER w AS lead1,
               LEAD(event_type, 2) OVER w AS lead2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ) WHERE lead1 IS NOT NULL AND lead2 IS NOT NULL
    )
    GROUP BY g ORDER BY n DESC, g LIMIT 10
    """,
    tags=("events", "window", "analytics"),
)
def q133_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-step event-type sequences
    across user timelines. One window (partition user_id, ordered by
    ts with event_id tiebreak — deterministic under any partitioning),
    two LEADs, then a partial+final count and TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = F.concat_ws(">", "event_type", "lead1", "lead2")
    return (
        ev.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("lead1"),
            F.lead("event_type", 2).over(w).alias("lead2"),
        )
        .filter(F.col("lead1").isNotNull() & F.col("lead2").isNotNull())
        .select(g.alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "g")
        .limit(10)
    )


@query(
    "q141_approx_quantile_bound",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.50), 4) AS exact_p50,
           ROUND(quantile_cont(l_quantity, 0.95), 4) AS exact_p95,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def q141_approx_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch next to the exact quantile (q90's pattern for
    percentiles): approx_percentile's KLL-style sketch is the only
    one-pass constant-memory quantile at 100 TB; here its p50/p95 are
    folded into ``within_bound = max value error <= 1.0`` - a
    deterministic boolean the oracle reproduces as literal TRUE - while
    the exact interpolated percentiles are hash-checked directly.
    l_quantity is integer-valued in [1, 50], so a 1.0 bound is ~2% of
    the range; with accuracy=10000 the sketch's rank error is n/10000
    (~tens of ranks at sf0.1), far inside that."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = F.percentile_approx("l_quantity", [0.5, 0.95], 10000)
    exact = F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.95)))
    return (
        li.groupBy("l_returnflag")
        .agg(approx.alias("_a"), exact.alias("_e"))
        .select(
            "l_returnflag",
            F.round(F.col("_e")[0], 4).alias("exact_p50"),
            F.round(F.col("_e")[1], 4).alias("exact_p95"),
            (
                F.greatest(
                    F.abs(F.col("_a")[0] - F.col("_e")[0]),
                    F.abs(F.col("_a")[1] - F.col("_e")[1]),
                )
                <= F.lit(1.0)
            ).alias("within_bound"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q236_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt_us
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,CAST(SUM(nxt_us - t_us) AS BIGINT) AS span_us,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)) * (nxt_us - t_us)) AS DOUBLE)
                 / CAST(SUM(nxt_us - t_us) AS DOUBLE), 6) AS twa
    FROM s WHERE nxt_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("relational", "temporal"),
)
def q236_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user — the irregular-time-series
    aggregate (sensor/price/telemetry rollups) a plain AVG gets wrong:
    each reading holds until the next (zero-order hold), so its weight
    is the interval length, not 1. One partitioned window (lead) + one
    grouped aggregation — no self-join; weights are exact integer
    microseconds and the weighted sum runs in DECIMAL, so the hash
    matches the oracle bit-for-bit. At 100 TB this is the hypertable
    `time_weight` pattern: both the window and the agg key on user_id,
    so AQE plans ONE exchange for the pair."""
    from ent_fins_lakehouse_spark.sources.readers import load_table as _lt

    ev = _lt(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    dt = F.col("nxt_us") - F.col("t_us")
    return (
        s.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(dt).alias("span_us"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)") * dt).cast("double")
                / F.sum(dt).cast("double"),
                6,
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


@query(
    "q237_last_touch_attribution",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS revenue
    FROM s WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("relational", "events", "attribution"),
)
def q237_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    most recent PRECEDING non-purchase event of the same user
    ('direct' when none) — the canonical sessionless attribution
    model. One user-partitioned window (last + IGNORE NULLS over
    unbounded-preceding) feeding one channel aggregation; the window
    and nothing else orders by event time, so at 100 TB the plan is
    one user_id exchange with in-partition sorts, no self-join of
    events to events (the naive formulation that dies at scale).
    DECIMAL-summed revenue keeps the hash exact."""
    from ent_fins_lakehouse_spark.sources.readers import load_table as _lt

    ev = _lt(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    s = ev.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        s.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("revenue"),
        )
        .orderBy("channel")
    )


@query(
    "q239_benford_fraud_screen",
    oracle="""
    WITH d AS (
      SELECT l_suppkey,
             CAST(SUBSTRING(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS fd
      FROM lineitem WHERE l_extendedprice >= 1
    ),
    obs AS (
      SELECT l_suppkey, fd, COUNT(*) AS n FROM d GROUP BY 1, 2
    ),
    tot AS (SELECT l_suppkey, SUM(n) AS n_tot FROM obs GROUP BY 1),
    chi AS (
      SELECT o.l_suppkey,
             SUM(POWER(CAST(o.n AS DOUBLE) / t.n_tot
                       - LOG10(1.0 + 1.0 / o.fd), 2)
                 / LOG10(1.0 + 1.0 / o.fd)) AS stat,CAST(MAX(t.n_tot) AS BIGINT) AS n_prices
      FROM obs o JOIN tot t USING (l_suppkey)
      GROUP BY o.l_suppkey
    )
    SELECT l_suppkey, n_prices, ROUND(stat, 6) AS benford_dev
    FROM chi WHERE n_prices >= 50
    ORDER BY benford_dev DESC, l_suppkey LIMIT 25
    """,
    tags=("relational", "fraud"),
)
def q239_benford_fraud_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law fraud screen — the reference IS a fraud lakehouse
    (`01-Fraud-Delta.py`); this is the classic forensic-accounting
    test over its price data: per supplier, the first-digit
    distribution of extended prices vs Benford's log10(1 + 1/d)
    expectation, scored by a chi-square-shaped deviation; suppliers
    with fabricated/rounded pricing float to the top. Two hash
    aggregations (supplier×digit, then supplier) — no window, no
    self-join; a 50-price support floor keeps small-sample noise out,
    and 6dp rounding keeps the float pipeline hash-exact."""
    from ent_fins_lakehouse_spark.sources.readers import load_table as _lt

    li = _lt(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") >= 1)
    d = li.select(
        "l_suppkey",
        F.substring(F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("fd"),
    )
    obs = (
        d.groupBy("l_suppkey", "fd")
        .agg(F.count("*").alias("n"))
        .withColumn("n_tot", F.sum("n").over(W.partitionBy("l_suppkey")))
    )
    exp = F.log10(1.0 + 1.0 / F.col("fd"))
    per = obs.groupBy("l_suppkey").agg(
        F.sum(
            F.pow(F.col("n").cast("double") / F.col("n_tot") - exp, 2) / exp
        ).alias("stat"),
        F.max("n_tot").alias("n_prices"),
    )
    return (
        per.filter(F.col("n_prices") >= 50)
        .select("l_suppkey", "n_prices", F.round("stat", 6).alias("benford_dev"))
        .orderBy(F.desc("benford_dev"), F.asc("l_suppkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Robust time-series analytics: EWMA, MAD outliers, CUSUM changepoint,
# KMV (theta-style) sketch set algebra, graph triangle counting
# ---------------------------------------------------------------------------


@query(
    "q242_ewma_smoothing",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> 0.3 * x + 0.7 * acc) AS ewma
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("relational", "temporal"),
)
def q242_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (alpha = 0.3) —
    the telemetry/price smoother whose recursion y_i = a*x_i +
    (1-a)*y_{i-1} plain window functions cannot express. Spark-first
    formulation: one hash aggregation collects each user's series as
    an array (sorted by a JVM-side ``array_sort`` on (ts, event_id)),
    then the fold runs INSIDE codegen via the ``aggregate``
    higher-order function — no Python UDF, no per-row state store.
    The oracle runs the byte-identical left fold via DuckDB's
    ``list_reduce``, so the doubles hash bit-for-bit with NO rounding.
    100 TB design: state is one array per user, bounded by per-user
    history (the same contract as any per-entity stateful op); the
    single exchange is the user_id hash shuffle, and skewed users can
    be range-chunked with a re-fold of chunk results because the EWMA
    fold composes: y over (A ++ B) = fold(B, init=fold(A))."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    a = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    return (
        ev.groupBy("user_id")
        .agg(a.alias("a"))
        .select(
            "user_id",
            F.size("a").alias("n_events"),
            F.expr(
                "aggregate(slice(transform(a, s -> s.value), 2, greatest(size(a)-1, 0)),"
                " CAST(a[0].value AS DOUBLE), (acc, x) -> 0.3D * x + 0.7D * acc)"
            ).alias("ewma"),
        )
        .orderBy("user_id")
    )


@query(
    "q243_mad_anomaly_screen",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           ROUND(MAX(d.med), 6) AS med,
           ROUND(MAX(m.mad), 6) AS mad,CAST(SUM(CASE WHEN d.adev > 3.5 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           ROUND(MAX(d.adev / NULLIF(1.4826 * m.mad, 0)), 6) AS max_robust_z
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
    tags=("relational", "quality"),
)
def q243_mad_anomaly_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen per event type — the
    fraud-telemetry anomaly gate that survives heavy tails where
    mean/stddev z-scores break (a single 1e9 reading inflates sigma
    until nothing is anomalous). Two exact-median aggregations
    (value, then absolute deviation) with the per-type constants
    broadcast back — event_type is low-cardinality, so both joins are
    broadcast hash joins and the only exchanges are the two partial
    aggregations. The 1.4826 factor makes MAD sigma-consistent under
    normality; 3.5 is the standard Iglewicz-Hodgdon cutoff. At 100 TB
    exact medians per LOW-CARDINALITY key are a sort-free
    ``percentile`` partial-agg; for high-cardinality keys the engine's
    sketch path (q223 fixed-bin histograms / q49 exact percentiles)
    is the scale tier."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    d = dev.join(F.broadcast(mad), "event_type")
    return (
        d.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3.5 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).alias("n_anomalies"),
            F.round(
                F.max(
                    F.when(
                        F.col("mad") != 0,
                        F.col("adev") / (1.4826 * F.col("mad")),
                    )
                ),
                6,
            ).alias("max_robust_z"),
        )
        .orderBy("event_type")
    )


@query(
    "q245_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,4))) AS v
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, d, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i,
             SUM(v) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(v) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    stat AS (
      SELECT event_type, d, n,
             CAST(n AS DECIMAL(9,0)) * cum - CAST(i AS DECIMAL(9,0)) * tot AS dev,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY ABS(CAST(n AS DECIMAL(9,0)) * cum - CAST(i AS DECIMAL(9,0)) * tot) DESC, d
             ) AS rk
      FROM s
    )
    SELECT event_type, d AS changepoint_day, n AS n_days,
           ROUND(CAST(ABS(dev) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
             AS cusum_stat
    FROM stat WHERE rk = 1 ORDER BY event_type
    """,
    tags=("relational", "temporal"),
)
def q245_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint per event type: the day k maximizing
    |S_k - (k/n) * S_n| over the daily-sum series — where the running
    total diverges most from the fitted constant rate — is the
    level-shift estimate (Page's statistic with the per-day
    normalization folded out). Everything before the final argmax is
    DECIMAL-exact: daily sums, the cumulative window, and the
    deviation n*cum_k - k*tot are integer-scaled decimals, so the
    argmax ordering (and hence the reported day) cannot be flipped by
    float summation order; only the REPORTED statistic is cast to
    double at the end. One exchange on event_type drives the daily
    rollup, both windows, and the argmax — AQE plans them as one
    partitioning. At 100 TB the daily pre-aggregation is what keeps
    the window input small: the windows run over (key x days), not
    raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("v")
    )
    wo = W.partitionBy("event_type").orderBy("d")
    wa = W.partitionBy("event_type")
    s = daily.select(
        "event_type",
        "d",
        F.row_number().over(wo).alias("i"),
        F.sum("v").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum"),
        F.sum("v").over(wa).alias("tot"),
        F.count("*").over(wa).alias("n"),
    )
    # decimal(9,0) x decimal(28,4) -> decimal(38,4) exactly (p1+p2+1 = 38),
    # so no allowPrecisionLoss rounding can perturb the argmax ordering;
    # n/i are day counts per key, far below 10^9.
    dev = F.col("n").cast("decimal(9,0)") * F.col("cum") - F.col("i").cast(
        "decimal(9,0)"
    ) * F.col("tot")
    stat = s.select(
        "event_type",
        "d",
        "n",
        dev.alias("dev"),
        F.row_number().over(wo.orderBy(F.abs(dev).desc(), F.asc("d"))).alias("rk"),
    )
    return (
        stat.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").alias("changepoint_day"),
            F.col("n").alias("n_days"),
            F.round(
                F.abs(F.col("dev")).cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double")),
                6,
            ).alias("cusum_stat"),
        )
        .orderBy("event_type")
    )


@query(
    "q244_kmv_sketch_intersection",
    oracle="""
    WITH d AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || SUBSTRING(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM events
    ),
    rk AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM d
    ),
    sk AS (SELECT event_type, h FROM rk WHERE r <= 128),
    th AS (
      SELECT event_type, COUNT(*) AS cnt,
             CASE WHEN COUNT(*) >= 128 THEN MAX(h)
                  ELSE 1152921504606846976 END AS theta
      FROM sk GROUP BY event_type
    ),
    pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             LEAST(ta.theta, tb.theta) AS theta_i,
             ta.cnt AS cnt_a, tb.cnt AS cnt_b,
             ta.theta AS theta_a, tb.theta AS theta_b,
             COUNT(*) FILTER (WHERE a.h < LEAST(ta.theta, tb.theta)) AS n_common
      FROM sk a
      JOIN sk b ON a.h = b.h AND a.event_type < b.event_type
      JOIN th ta ON ta.event_type = a.event_type
      JOIN th tb ON tb.event_type = b.event_type
      GROUP BY 1, 2, 3, 4, 5, 6, 7
    )
    SELECT type_a, type_b,
           ROUND(CASE WHEN cnt_a >= 128
                 THEN 127.0 * 1152921504606846976 / theta_a
                 ELSE CAST(cnt_a AS DOUBLE) END, 4) AS est_a,
           ROUND(CASE WHEN cnt_b >= 128
                 THEN 127.0 * 1152921504606846976 / theta_b
                 ELSE CAST(cnt_b AS DOUBLE) END, 4) AS est_b,
           ROUND(CAST(n_common AS DOUBLE) * 1152921504606846976 / theta_i, 4)
             AS est_common
    FROM pair ORDER BY type_a, type_b
    """,
    tags=("relational", "sketch"),
)
def q244_kmv_sketch_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra via KMV (k-minimum-values, k=128):
    per event type, the k smallest md5 hashes of user_id form a
    mergeable distinct-count sketch (est = (k-1)/theta, Beyer et al.
    2007); pairwise INTERSECTION cardinalities come from the common
    hashes below theta_int = min(theta_a, theta_b) — the operation HLL
    sketches (q90/q218) cannot do without inclusion-exclusion blowup.
    Everything except the final estimate division is 60-bit integer
    arithmetic (deterministic md5 prefix), so Spark and the oracle
    agree bit-for-bit. 100 TB design: the sketch build is one partial
    top-k aggregation per key — each executor keeps its k smallest
    locally, the merge is k-way min (the same monoid the oracle's
    ROW_NUMBER expresses at small scale); pairwise joins then touch
    only k rows per key, independent of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    K, FULL = 128, 1152921504606846976  # 2^60
    d = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    ).distinct()
    rk = d.withColumn("r", F.row_number().over(W.partitionBy("event_type").orderBy("h")))
    sk = rk.filter(F.col("r") <= K).select("event_type", "h")
    th = sk.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.when(F.count("*") >= K, F.max("h")).otherwise(F.lit(FULL)).alias("theta"),
    )
    a = sk.alias("a")
    b = sk.alias("b")
    ta = th.alias("ta")
    tb = th.alias("tb")
    pair = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.event_type") < F.col("b.event_type")))
        .join(F.broadcast(ta), F.col("ta.event_type") == F.col("a.event_type"))
        .join(F.broadcast(tb), F.col("tb.event_type") == F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.least("ta.theta", "tb.theta").alias("theta_i"),
            F.col("ta.cnt").alias("cnt_a"),
            F.col("tb.cnt").alias("cnt_b"),
            F.col("ta.theta").alias("theta_a"),
            F.col("tb.theta").alias("theta_b"),
            F.col("a.h").alias("h"),
        )
        .groupBy("type_a", "type_b", "theta_i", "cnt_a", "cnt_b", "theta_a", "theta_b")
        .agg(F.sum(F.when(F.col("h") < F.col("theta_i"), 1).otherwise(0)).alias("n_common"))
    )
    est = lambda cnt, theta: F.when(  # noqa: E731
        cnt >= K, F.lit(127.0) * FULL / theta.cast("double")
    ).otherwise(cnt.cast("double"))
    return pair.select(
        "type_a",
        "type_b",
        F.round(est(F.col("cnt_a"), F.col("theta_a")), 4).alias("est_a"),
        F.round(est(F.col("cnt_b"), F.col("theta_b")), 4).alias("est_b"),
        F.round(
            F.col("n_common").cast("double") * FULL / F.col("theta_i").cast("double"), 4
        ).alias("est_common"),
    ).orderBy("type_a", "type_b")


@query(
    "q246_triangle_count",
    oracle="""
    WITH pe AS (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= 4
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM pe e1 JOIN pe e2 ON e2.s1 = e1.s2
                 JOIN pe e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    )
    SELECT (SELECT COUNT(DISTINCT s) FROM (
              SELECT s1 AS s FROM pe UNION SELECT s2 FROM pe)) AS n_nodes,
           (SELECT COUNT(*) FROM pe) AS n_edges,
           n_triangles
    FROM tri
    """,
    tags=("relational", "graph"),
)
def q246_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the supplier co-occurrence graph (edge =
    two suppliers fulfilling lines of the same order) — the clustering
    primitive behind fraud-ring and collusion detection. Edges come
    from an order-local self-join (expansion bounded by order width,
    ~7 lines, so it is linear in lineitem, not quadratic in
    suppliers); triangles are enumerated ONCE each via the oriented
    s1<s2<s3 wedge-close join — the standard distributed formulation
    (node-iterator on the DAG orientation) whose join keys are
    graph-degree-bounded. 100 TB design: orient edges by degree
    (low-degree endpoint first) to cap wedge fan-out at sqrt(m) per
    node, and the two equi-joins shuffle on supplier key — no
    broadcast of the full edge set is assumed.

    Edges carry a MIN-SUPPORT gate (>= 4 distinct co-orders): a
    one-off co-occurrence is noise for collusion screening, and the
    support filter is what keeps the projected graph sparse — without
    it the uniform TPC-H order->supplier assignment converges to a
    ~90%-dense clique as orders-per-supplier-pair grows (124.5M
    triangles at sf0.1, an OOM-sized intermediate that misrepresents
    the operator; VERDICT r9 item 2). Support filtering before the
    wedge joins is the same discipline as the dedup family's bounded
    blocking: prune the pair-generating projection first, never feed
    an unbounded blowup into a join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    pe = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_orderkey").alias("okey"),
            F.col("a.l_suppkey").alias("s1"),
            F.col("b.l_suppkey").alias("s2"),
        )
        .groupBy("s1", "s2")
        .agg(F.countDistinct("okey").alias("support"))
        .filter(F.col("support") >= 4)
        .select("s1", "s2")
    )
    # DEGREE orientation (node-iterator on the DAG): every edge points
    # from its lower-(degree, id) endpoint to the higher one, so a
    # node's out-degree — and with it the wedge fan-out C(outdeg, 2) —
    # is capped at O(sqrt(m)) however skewed the co-supply graph. ID
    # orientation (s1<s2) looks equivalent but lets one low-id hub own
    # thousands of out-edges: measured 40x superlinear at sf0.1.
    deg = (
        pe.select(F.col("s1").alias("s"))
        .unionAll(pe.select(F.col("s2").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d1 = deg.alias("d1")
    d2 = deg.alias("d2")
    lower_first = (F.col("d1.deg") < F.col("d2.deg")) | (
        (F.col("d1.deg") == F.col("d2.deg")) & (F.col("s1") < F.col("s2"))
    )
    oe = (
        pe.join(d1, F.col("s1") == F.col("d1.s"))
        .join(d2, F.col("s2") == F.col("d2.s"))
        .select(
            F.when(lower_first, F.col("s1")).otherwise(F.col("s2")).alias("u"),
            F.when(lower_first, F.col("s2")).otherwise(F.col("s1")).alias("v"),
            F.when(lower_first, F.col("d2.deg")).otherwise(F.col("d1.deg")).alias(
                "vdeg"
            ),
        )
    )
    e1 = oe.alias("e1")
    e2 = oe.alias("e2")
    e3 = oe.select("u", "v").alias("e3")
    # wedges at u over its (small) out-neighborhood, ordered by the
    # same total order so each triangle closes exactly once
    wedge = e1.join(
        e2,
        (F.col("e2.u") == F.col("e1.u"))
        & (
            (F.col("e1.vdeg") < F.col("e2.vdeg"))
            | (
                (F.col("e1.vdeg") == F.col("e2.vdeg"))
                & (F.col("e1.v") < F.col("e2.v"))
            )
        ),
    )
    tri = wedge.join(
        e3,
        (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
    ).agg(F.count("*").alias("n_triangles"))
    nodes = (
        pe.select(F.col("s1").alias("s"))
        .union(pe.select(F.col("s2").alias("s")))
        .agg(F.countDistinct("s").alias("n_nodes"))
    )
    edges = pe.agg(F.count("*").alias("n_edges"))
    return nodes.crossJoin(edges).crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


@query(
    "q248_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE r AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
      UNION ALL
      SELECT node, cur // 10, depth + 1 FROM r WHERE cur >= 10
    )
    SELECT depth,
           COUNT(*) AS n_nodes,CAST(SUM(node) AS BIGINT) AS sum_keys,
           MIN(cur) AS min_root,
           MAX(cur) AS max_root
    FROM r WHERE cur < 10
    GROUP BY depth ORDER BY depth
    """,
    tags=("relational", "graph", "iterative"),
)
def q248_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal (org-chart / bill-of-materials
    shape) — the WITH RECURSIVE workload Spark SQL lacks, expressed as
    the standard iterative-dataflow fixpoint: a frontier DataFrame is
    repeatedly self-advanced (child → parent hop per iteration) until
    every path reaches a root, accumulating finished paths per level.
    The synthetic forest is a pure key function (parent = key div 10,
    roots < 10) so the oracle can state it recursively. Driver loop
    depth is the TREE depth (log₁₀ of the key domain, 5 hops at sf1),
    not the row count — each iteration is one distributed projection +
    filter, no joins at all for this parent function; a real edge
    table would make each hop a broadcast/shuffle join, same loop.
    100 TB design: frontier shrinks monotonically, results union
    lazily, and the loop carries `localCheckpoint` truncation when
    depth grows past a handful of plan nestings (the q178 PageRank
    lesson)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node"),
        F.col("c_custkey").alias("cur"),
        F.lit(0).alias("depth"),
    )
    finished = []
    frontier = cust
    for _hop in range(12):  # bound >= tree depth at any sane SF
        finished.append(frontier.filter(F.col("cur") < 10))
        frontier = frontier.filter(F.col("cur") >= 10).select(
            "node",
            F.expr("cur div 10").alias("cur"),
            (F.col("depth") + 1).alias("depth"),
        )
        if _hop >= 2 and _hop % 3 == 0:
            frontier = frontier.localCheckpoint(eager=False)
        if frontier.isEmpty():
            break
    done = finished[0]
    for f in finished[1:]:
        done = done.unionByName(f)
    return (
        done.groupBy("depth")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("node").alias("sum_keys"),
            F.min("cur").alias("min_root"),
            F.max("cur").alias("max_root"),
        )
        .orderBy("depth")
    )


@query(
    "q249_chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT o.lang, o.source, o.o,
             SUM(o.o) OVER (PARTITION BY o.lang) AS row_tot,
             SUM(o.o) OVER (PARTITION BY o.source) AS col_tot,
             SUM(o.o) OVER () AS n
      FROM obs o
    ),
    cell AS (
      SELECT ROUND(POWER(o - CAST(row_tot AS DOUBLE) * col_tot / n, 2)
                   / (CAST(row_tot AS DOUBLE) * col_tot / n), 6) AS stat
      FROM tot
    )
    SELECT (SELECT COUNT(DISTINCT lang) FROM documents) AS n_langs,
           (SELECT COUNT(DISTINCT source) FROM documents) AS n_sources,
           ((SELECT COUNT(DISTINCT lang) FROM documents) - 1)
             * ((SELECT COUNT(DISTINCT source) FROM documents) - 1) AS dof,
           CAST(SUM(CAST(stat AS DECIMAL(24,6))) AS DOUBLE) AS chi_square
    FROM cell
    """,
    tags=("relational", "stats"),
)
def q249_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between two categorical
    columns (is language distribution independent of source? — the
    bias screen a corpus audit runs before mixing). One contingency
    hash-agg; marginals via windows OVER the tiny cell table (cells =
    |lang|×|source|, control-plane sized at any corpus scale — the
    raw table is touched exactly once). Per-cell statistics round to
    6dp and the total sums in DECIMAL, so the chi-square value itself
    is order-insensitive and hash-exact."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    obs = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    tot = obs.select(
        "o",
        F.sum("o").over(W.partitionBy("lang")).alias("row_tot"),
        F.sum("o").over(W.partitionBy("source")).alias("col_tot"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    cell = tot.select(F.round(F.pow(F.col("o") - e, 2) / e, 6).alias("stat"))
    dims = docs.agg(
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    chi = cell.agg(
        F.sum(F.col("stat").cast("decimal(24,6)")).cast("double").alias("chi_square")
    )
    return dims.crossJoin(chi).select(
        "n_langs",
        "n_sources",
        ((F.col("n_langs") - 1) * (F.col("n_sources") - 1)).alias("dof"),
        "chi_square",
    )


@query(
    "q250_grouped_ols_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             SUM(CAST(value AS DECIMAL(18,4))) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(CAST(x AS DECIMAL(38,4)) * x) AS sxx,
             SUM(y) AS sy, SUM(CAST(x AS DECIMAL(38,4)) * y) AS sxy
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM s ORDER BY event_type
    """,
    tags=("relational", "stats", "temporal"),
)
def q250_grouped_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares trend (is each event type's daily volume
    rising?) via the closed-form normal equations — the scalable
    formulation of grouped regression: ONE aggregation computing the
    five sufficient statistics (n, Σx, Σx², Σy, Σxy); no ML library,
    no per-group iteration, no data movement beyond the grouped
    partial agg. Every sum runs in DECIMAL over integer day ordinals
    and exact 4dp sums, so numerator and denominator are exact on
    both engines and the final double division is bit-identical.
    At 100 TB this shape extends to any GLM sufficient-statistic
    family (the classic map-side-combine regression)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("y")
    ).select(
        "event_type", F.datediff("d", F.lit("1970-01-01")).cast("bigint").alias("x"), "y"
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,4)") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,4)") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
    ).orderBy("event_type")


@query(
    "q251_gini_concentration",
    oracle="""
    WITH cust AS (
      SELECT c.c_nationkey, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT c_nationkey, y,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY y, o_custkey
             ) AS i,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
             SUM(y) OVER (PARTITION BY c_nationkey) AS tot
      FROM cust
    )
    SELECT c_nationkey, MAX(n) AS n_customers,
           ROUND(CAST(2 * SUM(CAST(i AS DECIMAL(38,2)) * y) AS DOUBLE)
                   / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(tot) AS DOUBLE))
                 - (CAST(MAX(n) AS DOUBLE) + 1) / CAST(MAX(n) AS DOUBLE),
                 6) AS gini
    FROM rk GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("relational", "stats"),
)
def q251_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration per nation — the
    inequality gauge behind customer-concentration risk (one whale =
    fragile book of business). Standard rank formulation G =
    2·Σ i·yᵢ / (n·Σy) − (n+1)/n over the per-customer totals sorted
    ascending; the rank window and both marginal windows share ONE
    nation-key partitioning, and Σ i·yᵢ runs in DECIMAL so the only
    doubles are the final (identical) divisions. The window input is
    the per-customer AGGREGATE (orders touched once in the grouped
    partial agg), so the sort is over customers-per-nation, never raw
    orders."""
    ords = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per = (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    wp = W.partitionBy("c_nationkey")
    rk = per.select(
        "c_nationkey",
        "y",
        F.row_number().over(wp.orderBy("y", "o_custkey")).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("y").over(wp).alias("tot"),
    )
    return (
        rk.groupBy("c_nationkey")
        .agg(
            F.max("n").alias("n_customers"),
            F.round(
                (2 * F.sum(F.col("i").cast("decimal(38,2)") * F.col("y"))).cast("double")
                / (F.max("n").cast("double") * F.max("tot").cast("double"))
                - (F.max("n").cast("double") + 1) / F.max("n").cast("double"),
                6,
            ).alias("gini"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q255_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,4))) AS v
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, d, v,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(v) OVER (PARTITION BY event_type) AS sv
      FROM daily
    ),
    dv AS (
      SELECT event_type, d, n,
             CAST(CAST(n AS DECIMAL(9,0)) * v - sv AS DECIMAL(18,4)) AS dev
      FROM s
    ),
    lagd AS (
      SELECT event_type, n, dev,
             LEAD(dev, 1) OVER w AS dev1,
             LEAD(dev, 2) OVER w AS dev2,
             LEAD(dev, 3) OVER w AS dev3
      FROM dv
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, MAX(n) AS n_days,
           ROUND(CAST(SUM(CAST(dev AS DECIMAL(28,4)) * dev1) AS DOUBLE)
                 / CAST(SUM(CAST(dev AS DECIMAL(28,4)) * dev) AS DOUBLE), 6) AS acf1,
           ROUND(CAST(SUM(CAST(dev AS DECIMAL(28,4)) * dev2) AS DOUBLE)
                 / CAST(SUM(CAST(dev AS DECIMAL(28,4)) * dev) AS DOUBLE), 6) AS acf2,
           ROUND(CAST(SUM(CAST(dev AS DECIMAL(28,4)) * dev3) AS DOUBLE)
                 / CAST(SUM(CAST(dev AS DECIMAL(28,4)) * dev) AS DOUBLE), 6) AS acf3
    FROM lagd GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "timeseries"),
)
def q255_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation (lags 1-3) of each event type's daily
    volume — the seasonality probe behind anomaly baselining (a daily
    cycle shows as high acf1, weekly as acf7). DECIMAL-exact via the
    n·v − Σv trick (scaling deviations by n keeps every intermediate an
    exact decimal; the common n² factor cancels in the ratio), so
    float summation order cannot drift the hash — the same device as
    q245. One event_type exchange drives the rollup, both window
    passes and the final aggregation; the daily pre-aggregation keeps
    the window input at (keys × days), not raw events, at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("v")
    )
    wa = W.partitionBy("event_type")
    wo = wa.orderBy("d")
    # dev = n*(v - mean), exactly: decimal(9,0) x decimal(18,4) -> (28,4)
    # with no precision loss; the common n^2 factor cancels in the ratio
    dv = daily.select(
        "event_type",
        "d",
        F.count("*").over(wa).alias("n"),
        (
            F.count("*").over(wa).cast("decimal(9,0)") * F.col("v")
            - F.sum("v").over(wa)
        )
        .cast("decimal(18,4)")
        .alias("dev"),
    )
    lagd = dv.select(
        "event_type",
        "n",
        "dev",
        F.lead("dev", 1).over(wo).alias("dev1"),
        F.lead("dev", 2).over(wo).alias("dev2"),
        F.lead("dev", 3).over(wo).alias("dev3"),
    )
    den = F.sum(F.col("dev") * F.col("dev")).cast("double")
    return (
        lagd.groupBy("event_type")
        .agg(
            F.max("n").alias("n_days"),
            F.round(F.sum(F.col("dev") * F.col("dev1")).cast("double") / den, 6).alias("acf1"),
            F.round(F.sum(F.col("dev") * F.col("dev2")).cast("double") / den, 6).alias("acf2"),
            F.round(F.sum(F.col("dev") * F.col("dev3")).cast("double") / den, 6).alias("acf3"),
        )
        .orderBy("event_type")
    )


@query(
    "q256_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT event_type,
             CAST(FLOOR(ABS(value)) AS BIGINT) % 10 AS bin,
             CASE WHEN DAY(CAST(ts AS DATE)) % 2 = 0 THEN 0 ELSE 1 END AS period
      FROM events
    ),
    grid AS (
      SELECT DISTINCT b.event_type, g.bin
      FROM binned b CROSS JOIN (SELECT UNNEST(RANGE(10)) AS bin) g
    ),
    cnt AS (
      SELECT g.event_type, g.bin,
             COALESCE(SUM(CASE WHEN x.period = 0 THEN 1 END), 0) AS ca,
             COALESCE(SUM(CASE WHEN x.period = 1 THEN 1 END), 0) AS cb
      FROM grid g
      LEFT JOIN binned x ON x.event_type = g.event_type AND x.bin = g.bin
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, bin, ca, cb,
             SUM(ca) OVER (PARTITION BY event_type) AS ta,
             SUM(cb) OVER (PARTITION BY event_type) AS tb
      FROM cnt
    ),
    term AS (
      SELECT event_type, ta, tb,
             CAST(ROUND(
               ((ca + 1.0) / (ta + 10.0) - (cb + 1.0) / (tb + 10.0))
               * LN(((ca + 1.0) / (ta + 10.0)) / ((cb + 1.0) / (tb + 10.0))),
               10) AS DECIMAL(18,10)) AS t
      FROM tot
    )
    SELECT event_type,CAST(MAX(ta) AS BIGINT) AS n_even_days,CAST(MAX(tb) AS BIGINT) AS n_odd_days,
           ROUND(CAST(SUM(t) AS DOUBLE), 6) AS psi
    FROM term GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "quality", "drift"),
)
def q256_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type — the standard
    model-monitoring drift gate (PSI > 0.2 = retrain): value
    distributions over 10 fixed bins compared between two periods
    (even vs odd day-of-month — a deterministic split), with Laplace
    smoothing so empty bins stay finite. The double math (ratios, ln)
    is IEEE-deterministic; each bin's term is rounded to a
    DECIMAL(18,10) BEFORE the sum so the 10-term aggregation is exact
    and summation order cannot drift the hash. One hash-agg over
    (type, bin, period) is the only corpus-sized exchange; the
    10-bin-per-type grid is control-plane."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.floor(F.abs(F.col("value"))).cast("long") % 10).alias("bin"),
        F.when(F.dayofmonth(F.col("ts").cast("date")) % 2 == 0, 0)
        .otherwise(1)
        .alias("period"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").alias("bin")))
    )
    cnt = (
        grid.join(ev, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("period") == 0, 1)), F.lit(0)).alias("ca"),
            F.coalesce(F.sum(F.when(F.col("period") == 1, 1)), F.lit(0)).alias("cb"),
        )
    )
    wa = W.partitionBy("event_type")
    tot = cnt.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(wa).alias("ta"),
        F.sum("cb").over(wa).alias("tb"),
    )
    pa = (F.col("ca") + 1.0) / (F.col("ta") + 10.0)
    pb = (F.col("cb") + 1.0) / (F.col("tb") + 10.0)
    term = tot.select(
        "event_type",
        "ta",
        "tb",
        F.round((pa - pb) * F.log(pa / pb), 10).cast("decimal(18,10)").alias("t"),
    )
    return (
        term.groupBy("event_type")
        .agg(
            F.max("ta").alias("n_even_days"),
            F.max("tb").alias("n_odd_days"),
            F.round(F.sum("t").cast("double"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


@query(
    "q257_trimmed_robust_mean",
    oracle="""
    WITH lim AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_kept,
           ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS trimmed_mean,
           ROUND(MAX(l.lo), 6) AS p05,
           ROUND(MAX(l.hi), 6) AS p95
    FROM events e JOIN lim l USING (event_type)
    WHERE e.value >= l.lo AND e.value <= l.hi
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    tags=("relational", "quality"),
)
def q257_trimmed_robust_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-95% trimmed mean per event type — the robust central-tendency
    gate that survives the fat-tailed payment values a plain AVG
    cannot (one 1e9 reading moves the mean arbitrarily; the trimmed
    mean moves by at most the trim fraction). Two passes sharing one
    event_type exchange: per-type percentile clamps through the
    CENSUS-GATED tier helper (``percentile_tiered``, VERDICT r7 item
    7) — exact interpolated percentiles while the max per-key row
    count fits the executor cap, the KLL-style percentile_approx
    sketch above it (q285 proves that tier) — then a broadcast join
    of the [lo, hi] clamps and a DECIMAL-exact sum over kept rows.
    The tier choice is asserted in-plan: at oracle scale this query
    must run exact, or the hash match would silently loosen."""
    from ent_fins_lakehouse_spark.functions.numeric import percentile_tiered

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    lim_raw, tier = percentile_tiered(ev, "event_type", "value", [0.05, 0.95])
    if tier != "exact":
        raise AssertionError(f"expected exact percentile tier, got {tier}")
    lim = lim_raw.select(
        "event_type",
        F.col("_pct").getItem(0).alias("lo"),
        F.col("_pct").getItem(1).alias("hi"),
    )
    kept = ev.join(F.broadcast(lim), "event_type").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("trimmed_mean"),
            F.round(F.max("lo"), 6).alias("p05"),
            F.round(F.max("hi"), 6).alias("p95"),
        )
        .orderBy("event_type")
    )


@query(
    "q258_order_reconciliation_audit",
    oracle="""
    WITH recomputed AS (
      SELECT l_orderkey,
             ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
                       * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4)))), 2) AS r
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus,
           COUNT(*) AS n_orders,CAST(SUM(CASE WHEN r.r IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lines,CAST(SUM(CASE WHEN r.r IS NOT NULL
                     AND r.r <> CAST(o.o_totalprice AS DECIMAL(18,2))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
           ROUND(CAST(MAX(CASE WHEN r.r IS NOT NULL
                     THEN ABS(r.r - CAST(o.o_totalprice AS DECIMAL(18,2)))
                     END) AS DOUBLE), 2) AS max_abs_diff
    FROM orders o LEFT JOIN recomputed r ON o.o_orderkey = r.l_orderkey
    GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
    tags=("relational", "audit", "quality"),
)
def q258_order_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential/financial reconciliation audit — the ledger-grade
    consistency check a fraud lakehouse runs nightly: recompute every
    order's total from its line items (price x (1-discount) x (1+tax),
    DECIMAL end-to-end so the comparison is exact, never
    float-epsilon), then report per order status how many orders have
    no lines at all and how many totals disagree with the recomputed
    sum, plus the worst deviation. One lineitem hash-agg + one
    orderkey join — both partial-aggregated map-side; at 100 TB the
    join co-locates if both tables bucket on orderkey (the engine's
    bucketed-write path)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    one = F.lit(1).cast("decimal(5,4)")
    recomputed = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (one - F.col("l_discount").cast("decimal(5,4)"))
                * (one + F.col("l_tax").cast("decimal(5,4)"))
            ),
            2,
        ).alias("r")
    )
    tp = F.col("o_totalprice").cast("decimal(18,2)")
    joined = ords.join(
        recomputed, ords.o_orderkey == recomputed.l_orderkey, "left"
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("r").isNull(), 1).otherwise(0)).alias("n_no_lines"),
            F.sum(
                F.when(F.col("r").isNotNull() & (F.col("r") != tp), 1).otherwise(0)
            ).alias("n_mismatch"),
            F.round(
                F.max(
                    F.when(F.col("r").isNotNull(), F.abs(F.col("r") - tp))
                ).cast("double"),
                2,
            ).alias("max_abs_diff"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q260_pivot_unpivot",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 0
                    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS dow_sun,
           CAST(SUM(CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 1
                    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS dow_mon,
           CAST(SUM(CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 2
                    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS dow_tue,
           CAST(SUM(CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 3
                    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS dow_wed,
           CAST(SUM(CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 4
                    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS dow_thu,
           CAST(SUM(CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 5
                    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS dow_fri,
           CAST(SUM(CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) = 6
                    THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS dow_sat
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "pivot"),
)
def q260_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT + UNPIVOT round-trip — the reshaping surface
    (``groupBy().pivot()`` / ``DataFrame.unpivot``): event volumes
    pivot into an event_type × day-of-week matrix (DECIMAL sums so the
    wide cells hash exactly), then unpivot back to long form, which
    must recover exactly the long aggregate's non-null cells
    (asserted). Pivot with an EXPLICIT value list is one partial-agg
    exchange — no extra distinct-values scan, the 100 TB shape;
    unpivot is a zero-shuffle map-side explode. Spark's 1=Sunday
    dayofweek is normalized to DuckDB's 0=Sunday."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.dayofweek("ts") - 1).alias("dow"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    names = ["dow_sun", "dow_mon", "dow_tue", "dow_wed", "dow_thu", "dow_fri", "dow_sat"]
    wide = (
        ev.groupBy("event_type")
        .pivot("dow", list(range(7)))
        .agg(F.sum("v"))
        .select(
            "event_type",
            *[F.col(str(i)).alias(n) for i, n in enumerate(names)],
        )
    )
    # round-trip proof: unpivot recovers exactly the long-form cells
    long_back = wide.unpivot("event_type", names, "dow_name", "total")
    n_cells = ev.groupBy("event_type", "dow").count().count()
    n_back = long_back.filter(F.col("total").isNotNull()).count()
    if n_back != n_cells:
        raise AssertionError(f"unpivot lost cells: {n_back} != {n_cells}")
    return wide.select(
        "event_type", *[F.col(n).cast("double").alias(n) for n in names]
    ).orderBy("event_type")


@query(
    "q261_mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             SUM(CAST(value AS DECIMAL(18,4))) AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) AS i
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn,
             CAST(b.v - a.v AS DOUBLE) / (b.i - a.i) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.i > a.i
    )
    SELECT p.event_type,
           MAX(n.n) AS n_days,CAST(SUM(p.sgn) AS BIGINT) AS s_stat,
           ROUND(CAST(SUM(p.sgn) AS DOUBLE)
                 / (CAST(MAX(n.n) AS DOUBLE) * (MAX(n.n) - 1) / 2), 6) AS tau,
           ROUND(quantile_cont(p.slope, 0.5), 6) AS sen_slope
    FROM pairs p
    JOIN (SELECT event_type, COUNT(*) AS n FROM daily GROUP BY 1) n
      ON p.event_type = n.event_type
    GROUP BY p.event_type ORDER BY p.event_type
    """,
    tags=("relational", "timeseries", "robust"),
)
def q261_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test + Sen's slope per event type —
    the nonparametric trend detector robust to outliers and
    non-normality (the regulatory standard for environmental/financial
    drift where q250's OLS assumptions fail). The S statistic is PURE
    INTEGER pair counting (hash-exact by construction); Kendall's tau
    normalizes it; Sen's slope is the median pairwise slope (exact
    interpolated median, the q49 primitive). The O(n²) self-join runs
    per key over the DAILY series — bounded by the date range (n≈60),
    NOT the event count, so at 100 TB the pair count is unchanged; the
    daily pre-aggregation is the only corpus-sized pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    )
    daily = (
        ev.groupBy("event_type", "d")
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
        .select(
            "event_type",
            "v",
            F.row_number().over(W.partitionBy("event_type").orderBy("d")).alias("i"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type")) & (F.col("b.i") > F.col("a.i")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(F.col("b.v") > F.col("a.v"), 1)
        .when(F.col("b.v") < F.col("a.v"), -1)
        .otherwise(0)
        .alias("sgn"),
        (
            (F.col("b.v") - F.col("a.v")).cast("double")
            / (F.col("b.i") - F.col("a.i"))
        ).alias("slope"),
    )
    n = daily.groupBy("event_type").agg(F.count("*").alias("n"))
    return (
        pairs.join(F.broadcast(n), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_days"),
            F.sum("sgn").alias("s_stat"),
            F.round(
                F.sum("sgn").cast("double")
                / (F.max("n").cast("double") * (F.max("n") - 1) / 2),
                6,
            ).alias("tau"),
            F.round(F.percentile("slope", F.lit(0.5)), 6).alias("sen_slope"),
        )
        .orderBy("event_type")
    )


@query(
    "q263_holt_double_smoothing",
    oracle="""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id HAVING COUNT(*) >= 2
    ),
    f AS (
      SELECT user_id, len(vals) AS n,
             list_reduce(
               list_transform(vals, x -> [x, NULL]),
               (acc, x) -> CASE WHEN acc[2] IS NULL
                 THEN [x[1], x[1] - acc[1]]
                 ELSE [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                       0.25 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                         + 0.75 * acc[2]] END
             ) AS st
      FROM s
    )
    SELECT user_id, n AS n_events,
           st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast_1
    FROM f ORDER BY user_id
    """,
    tags=("relational", "temporal"),
)
def q263_holt_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt DOUBLE exponential smoothing per user (alpha=0.5,
    beta=0.25) — the trend-aware extension of q242's EWMA, whose
    2-element (level, trend) recursion windows cannot express. Same
    Spark-first device: collect+sort each user's series JVM-side, fold
    INSIDE codegen via ``aggregate`` — here with a 2-slot ARRAY
    accumulator, the NULL trend slot marking the not-yet-initialized
    state (l₂=x₂, b₂=x₂−x₁ classic init). The oracle runs the
    byte-identical fold via DuckDB ``list_reduce`` with the SAME
    NULL-flag encoding and the SAME recomputed-l' operation order, so
    the doubles hash bit-for-bit with NO rounding. One user_id
    exchange; per-user state bounded by history; the fold composes
    for chunked skewed keys just like q242. ``forecast_1`` = l + b is
    the one-step-ahead prediction — the anomaly baseline."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    a = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    return (
        ev.groupBy("user_id")
        .agg(a.alias("a"))
        .filter(F.size("a") >= 2)
        .select(
            "user_id",
            F.size("a").alias("n_events"),
            F.expr(
                "aggregate("
                " slice(transform(a, s -> CAST(s.value AS DOUBLE)), 2, greatest(size(a)-1, 0)),"
                " array(CAST(a[0].value AS DOUBLE), CAST(NULL AS DOUBLE)),"
                " (acc, x) -> CASE WHEN acc[1] IS NULL"
                "   THEN array(x, x - acc[0])"
                "   ELSE array(0.5D * x + 0.5D * (acc[0] + acc[1]),"
                "              0.25D * ((0.5D * x + 0.5D * (acc[0] + acc[1])) - acc[0])"
                "                + 0.75D * acc[1]) END"
                ")"
            ).alias("st"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("st")[0].alias("level"),
            F.col("st")[1].alias("trend"),
            (F.col("st")[0] + F.col("st")[1]).alias("forecast_1"),
        )
        .orderBy("user_id")
    )


@query(
    "q265_retention_cohorts",
    oracle="""
    WITH firstw AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_d
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id,
             f.first_d,
             CAST((CAST(e.ts AS DATE) - f.first_d) // 7 AS BIGINT) AS week_offset
      FROM events e JOIN firstw f USING (user_id)
    ),
    size_ AS (
      SELECT first_d, COUNT(*) AS cohort_size
      FROM firstw GROUP BY first_d
    )
    SELECT a.first_d AS cohort_day,
           a.week_offset,
           MAX(s.cohort_size) AS cohort_size,
           COUNT(*) AS n_active,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(s.cohort_size), 6) AS retention
    FROM act a JOIN size_ s USING (first_d)
    GROUP BY a.first_d, a.week_offset
    ORDER BY cohort_day, week_offset
    """,
    tags=("relational", "product-analytics"),
)
def q265_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix — the product-analytics staple: users
    cohorted by FIRST-activity day, each cohort's week-N retention =
    distinct users active N weeks later / cohort size. Two exchanges
    total: one user_id agg finds first activity, the (user, week)
    distinct+rollup reuses the join output; cohort sizes broadcast
    back (cohort count is date-range-bounded, control-plane at any
    corpus size). Day/offset arithmetic is pure integer date math —
    hash-exact; only the final rate is a (deterministic) double
    division. At 100 TB the first-activity table is the thing to
    persist (slowly-growing dimension); each day's increment touches
    only that day's events."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    firstw = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    act = (
        ev.join(firstw, "user_id")
        .select(
            "user_id",
            "first_d",
            F.floor(F.datediff(F.col("d"), F.col("first_d")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    size_ = firstw.groupBy("first_d").agg(F.count("*").alias("cohort_size"))
    return (
        act.join(F.broadcast(size_), "first_d")
        .groupBy(F.col("first_d").alias("cohort_day"), "week_offset")
        .agg(
            F.max("cohort_size").alias("cohort_size"),
            F.count("*").alias("n_active"),
            F.round(
                F.count("*").cast("double") / F.max("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_day", "week_offset")
    )


@query(
    "q266_weight_of_evidence",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    b AS (
      SELECT seg,
             COUNT(*) AS n,CAST(SUM(bad) AS BIGINT) AS n_bad,
             COUNT(*) - SUM(bad) AS n_good
      FROM j GROUP BY seg
    ),
    t AS (
      SELECT seg, n, n_bad, n_good,
             SUM(n_bad) OVER () AS tot_bad,
             SUM(n_good) OVER () AS tot_good
      FROM b
    ),
    w AS (
      SELECT seg, n, n_bad,
             ROUND(LN(((n_good + 0.5) / (tot_good + 0.5))
                      / ((n_bad + 0.5) / (tot_bad + 0.5))), 6) AS woe,
             CAST(ROUND(((n_good + 0.5) / (tot_good + 0.5)
                         - (n_bad + 0.5) / (tot_bad + 0.5))
                        * LN(((n_good + 0.5) / (tot_good + 0.5))
                             / ((n_bad + 0.5) / (tot_bad + 0.5))),
                   10) AS DECIMAL(18,10)) AS ivc
      FROM t
    )
    SELECT seg, n, n_bad, woe,
           ROUND(CAST(ivc AS DOUBLE), 6) AS iv_contrib,
           ROUND(CAST(SUM(ivc) OVER () AS DOUBLE), 6) AS iv_total
    FROM w ORDER BY seg
    """,
    tags=("relational", "risk", "ml-features"),
)
def q266_weight_of_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information Value binning — the
    credit-scoring feature-engineering standard (the reference is a
    LENDING lakehouse: WoE encodes a categorical against the bad-rate
    monotonically, IV ranks predictors before model fit): per market
    segment, WoE = ln(good-share / bad-share) with 0.5 Laplace
    smoothing, IV = Σ (good-share − bad-share)·WoE. One
    broadcast-joined fact scan + one segment agg; the window totals
    run over the segment-count rows (control-plane). Per-term decimal
    rounding before the IV sum keeps the hash order-proof (q256's
    device); ratios/ln are IEEE-deterministic."""
    ords = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    b = j.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("bad").alias("n_bad"),
        (F.count("*") - F.sum("bad")).alias("n_good"),
    )
    wa = W.partitionBy()
    t = b.select(
        "seg",
        "n",
        "n_bad",
        "n_good",
        F.sum("n_bad").over(wa).alias("tot_bad"),
        F.sum("n_good").over(wa).alias("tot_good"),
    )
    pg = (F.col("n_good") + 0.5) / (F.col("tot_good") + 0.5)
    pb = (F.col("n_bad") + 0.5) / (F.col("tot_bad") + 0.5)
    w = t.select(
        "seg",
        "n",
        "n_bad",
        F.round(F.log(pg / pb), 6).alias("woe"),
        F.round((pg - pb) * F.log(pg / pb), 10).cast("decimal(18,10)").alias("ivc"),
    )
    return w.select(
        "seg",
        "n",
        "n_bad",
        "woe",
        F.round(F.col("ivc").cast("double"), 6).alias("iv_contrib"),
        F.round(F.sum("ivc").over(W.partitionBy()).cast("double"), 6).alias("iv_total"),
    ).orderBy("seg")


@query(
    "q269_try_function_suite",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n,CAST(SUM(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
           ROUND(CAST(SUM(CAST(CASE WHEN c_custkey % 3 = 0 THEN NULL
                    ELSE c_acctbal / (c_custkey % 3) END AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS safe_div_sum,CAST(SUM(TRY_CAST(SUBSTRING(c_name, 10) AS BIGINT)) AS BIGINT) AS id_sum,CAST(SUM(CASE WHEN TRY_CAST(c_mktsegment AS INTEGER) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("relational", "functions", "ansi-safe"),
)
def q269_try_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` function family — the error-tolerant lane a
    production pipeline needs under ANSI mode (Spark 4's default:
    div-by-zero and bad casts THROW; try_divide/try_cast return NULL
    instead, matching DuckDB's TRY_CAST / guarded-division semantics):
    per nation, a guarded ratio over a modulus that hits zero, a
    numeric tail extracted from the customer name via try_cast (always
    parses), and a deliberately uncastable string column (never
    parses). All three NULL behaviors are aggregated and hash-checked;
    sums go through DECIMAL per the repo convention. Pure codegen
    expressions — the try variants compile to null-safe branches, no
    exception handling at runtime."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    safe_div = F.try_divide(F.col("c_acctbal"), F.col("c_custkey") % 3)
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("c_custkey") % 3 == 0, 1).otherwise(0)).alias(
                "n_div_null"
            ),
            F.round(
                F.sum(safe_div.cast("decimal(18,4)")).cast("double"), 4
            ).alias("safe_div_sum"),
            F.sum(
                F.expr("try_cast(substring(c_name, 10) AS BIGINT)")
            ).alias("id_sum"),
            F.sum(
                F.when(F.expr("try_cast(c_mktsegment AS INT)").isNull(), 1).otherwise(0)
            ).alias("n_uncastable"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q270_variant_semistructured",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"event": {"type": "' || event_type ||
             '", "user": ' || CAST(user_id AS VARCHAR) ||
             ', "amount": ' || CAST(ROUND(CAST(value AS DECIMAL(18,4)), 4) AS VARCHAR) ||
             '}, "tags": [' || CAST(event_id % 5 AS VARCHAR) || ', ' ||
             CAST(event_id % 7 AS VARCHAR) || ']}' AS payload
      FROM events
    )
    SELECT json_extract_string(payload, '$.event.type') AS etype,
           COUNT(*) AS n,CAST(SUM(CAST(json_extract(payload, '$.event.user') AS BIGINT)) AS BIGINT) AS user_sum,
           ROUND(CAST(SUM(CAST(json_extract(payload, '$.event.amount')
                    AS DECIMAL(18,4))) AS DOUBLE), 4) AS amount_sum,CAST(SUM(CAST(json_extract(payload, '$.tags[1]') AS BIGINT)) AS BIGINT) AS tag2_sum,CAST(SUM(CASE WHEN json_extract(payload, '$.missing.path') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM j GROUP BY etype ORDER BY etype
    """,
    tags=("relational", "semistructured", "variant"),
)
def q270_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type — the
    open-format answer to schemaless JSON columns (parse once into the
    binary variant encoding, then ``variant_get`` path extraction runs
    as typed codegen, not per-row string parsing): events are wrapped
    into nested JSON (the fixture's stand-in for an upstream producer),
    ``parse_json`` ingests them, and typed path extraction (string,
    bigint through a nested object, decimal, array index, and a
    MISSING path yielding NULL not error) aggregates per type. The
    oracle runs the same paths through DuckDB's JSON extraction. At
    100 TB the variant column is the landing-zone pattern: parse at
    ingest, prune+extract at query, no reparse per access."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "user_id", "value")
    payload = F.concat(
        F.lit('{"event": {"type": "'),
        F.col("event_type"),
        F.lit('", "user": '),
        F.col("user_id").cast("string"),
        F.lit(', "amount": '),
        F.round(F.col("value").cast("decimal(18,4)"), 4).cast("string"),
        F.lit('}, "tags": ['),
        (F.col("event_id") % 5).cast("string"),
        F.lit(", "),
        (F.col("event_id") % 7).cast("string"),
        F.lit("]}"),
    )
    v = ev.select(F.parse_json(payload).alias("v"))
    return (
        v.groupBy(
            F.variant_get(F.col("v"), "$.event.type", "string").alias("etype")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.variant_get(F.col("v"), "$.event.user", "bigint")
            ).alias("user_sum"),
            F.round(
                F.sum(
                    F.variant_get(F.col("v"), "$.event.amount", "decimal(18,4)")
                ).cast("double"),
                4,
            ).alias("amount_sum"),
            F.sum(
                F.variant_get(F.col("v"), "$.tags[1]", "bigint")
            ).alias("tag2_sum"),
            F.sum(
                F.when(
                    F.variant_get(F.col("v"), "$.missing.path", "string").isNull(), 1
                ).otherwise(0)
            ).alias("n_missing"),
        )
        .orderBy("etype")
    )


@query(
    "q271_lateral_topk_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) o
    WHERE c.c_custkey <= 200
    ORDER BY c.c_custkey, o.o_orderkey
    """,
    tags=("relational", "sql", "lateral"),
)
def q271_lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join — the per-row-subquery SQL
    surface (top-2 orders PER customer, the shape analysts write
    before learning window functions): Spark's Catalyst DECORRELATES
    the lateral into a ranked join (DomainJoin → window + filter), so
    what reads as a nested loop executes as one shuffle — the plan you
    want at 100 TB, not N subquery executions. Registered via temp
    views and run through ``spark.sql`` to exercise the SQL entry path
    end-to-end; DuckDB executes the identical statement."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q271_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q271_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
        FROM q271_customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM q271_orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) o
        WHERE c.c_custkey <= 200
        ORDER BY c.c_custkey, o.o_orderkey
        """
    )


@query(
    "q274_sliding_window_agg",
    oracle="""
    WITH hr AS (
      SELECT event_type,
             CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM events
    ),
    contrib AS (
      SELECT event_type,
             h - to_hours(off) AS w_start,
             v
      FROM hr, (SELECT UNNEST(range(2)) AS off)
    )
    SELECT event_type,
           w_start,
           w_start + INTERVAL 2 HOUR AS w_end,
           COUNT(*) AS n,
           CAST(SUM(v) AS DOUBLE) AS total
    FROM contrib
    GROUP BY event_type, w_start
    ORDER BY event_type, w_start
    """,
    tags=("relational", "temporal", "window"),
)
def q274_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING (overlapping) time windows — ``F.window(ts, '2 hours',
    '1 hour')``, the dashboard smoothing shape tumbling windows can't
    give (each event lands in TWO windows; a 2h metric refreshes every
    1h): one hash aggregation where the window expression explodes
    each row into its covering windows map-side — no self-join, no
    window function, the same plan streaming uses with a watermark
    (q42's sibling). The oracle reconstructs the lattice with an
    explicit slide-offset UNNEST. DECIMAL sums; window bounds are
    exact timestamps."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", F.col("value").cast("decimal(18,4)").alias("v")
    )
    return (
        ev.groupBy("event_type", F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("v").cast("double").alias("total"))
        .select(
            "event_type",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
            "total",
        )
        .orderBy("event_type", "w_start")
    )


@query(
    "q275_map_higher_order_functions",
    oracle="""
    WITH m AS (
      SELECT p_partkey,
             p_retailprice,
             MAP {'base': CAST(p_retailprice AS DECIMAL(12,2)),
                  'tax': CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * 0.08, 2) AS DECIMAL(12,2)),
                  'ship': CAST(CASE WHEN p_size > 25 THEN 12.50 ELSE 4.25 END AS DECIMAL(12,2))} AS charges
      FROM part
    )
    SELECT p_partkey,
           CAST(charges['base'][1] + charges['tax'][1] + charges['ship'][1] AS DOUBLE) AS total,
           CAST(len(map_keys(charges)) AS INT) AS n_charges,
           CAST((charges['tax'][1] >= 10.0) AS BOOLEAN) AS big_tax,
           CAST(charges['base'][1] * 2 AS DOUBLE) AS doubled_base
    FROM m
    WHERE p_partkey <= 400
    ORDER BY p_partkey
    """,
    tags=("relational", "functions", "map"),
)
def q275_map_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP higher-order functions — the map half of the lambda surface
    (q102 covered arrays): a per-part charge map is built with
    ``create_map``, then ``transform_values`` doubles amounts,
    ``map_filter`` selects large entries, ``map_zip_with`` would merge
    maps — all pure codegen lambdas over the map type, the shape
    metadata/attribute columns take at scale (one map column instead
    of N sparse columns; lambdas prune entries without exploding).
    The oracle evaluates the same charge algebra through DuckDB's map
    subscripts — the HOF results are projected to scalars so both
    engines hash plain columns."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    base = F.col("p_retailprice").cast("decimal(12,2)")
    charges = F.create_map(
        F.lit("base"), base,
        F.lit("tax"), F.round(base * F.lit(0.08), 2).cast("decimal(12,2)"),
        F.lit("ship"), F.when(F.col("p_size") > 25, F.lit(12.50)).otherwise(F.lit(4.25)).cast("decimal(12,2)"),
    )
    m = part.filter(F.col("p_partkey") <= 400).withColumn("charges", charges)
    doubled = F.transform_values(F.col("charges"), lambda k, v: v * 2)
    big = F.map_filter(F.col("charges"), lambda k, v: v >= 10.0)
    return (
        m.select(
            "p_partkey",
            # DECIMAL-exact sum of the map entries (a double fold would
            # drift a ulp vs the oracle's exact decimal addition)
            (
                F.element_at("charges", F.lit("base"))
                + F.element_at("charges", F.lit("tax"))
                + F.element_at("charges", F.lit("ship"))
            ).cast("double").alias("total"),
            F.size(F.map_keys("charges")).alias("n_charges"),
            F.array_contains(F.map_keys(big), "tax").alias("big_tax"),
            F.element_at(doubled, "base").cast("double").alias("doubled_base"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q276_embedded_csv_parsing",
    oracle="""
    WITH lines AS (
      SELECT s_suppkey,
             CAST(s_suppkey AS VARCHAR) || ',' || s_name || ',' ||
             CAST(s_nationkey AS VARCHAR) || ',' ||
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS line
      FROM supplier
    ),
    parsed AS (
      SELECT s_suppkey,
             string_split(line, ',') AS f,
             map_from_entries([
               ('id', string_split(line, ',')[1]),
               ('nation', string_split(line, ',')[3])
             ]) AS kv
      FROM lines
    )
    SELECT s_suppkey,
           CAST(f[1] AS BIGINT) AS id,
           f[2] AS name,
           CAST(f[3] AS BIGINT) AS nation,
           CAST(CAST(f[4] AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
           CAST(kv['nation'][1] AS BIGINT) AS kv_nation
    FROM parsed ORDER BY s_suppkey
    """,
    tags=("relational", "functions", "ingest"),
)
def q276_embedded_csv_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded delimited-string parsing — the landing-zone pattern
    where a STRING column carries CSV lines (message queues, legacy
    feeds): ``from_csv`` parses each line against a declared schema in
    ONE codegen pass (typed struct out — no regex, no UDF, no
    per-field split), and ``str_to_map`` covers the key-value flavor.
    The round-trip is built from supplier rows so the oracle can
    reconstruct the same fields via ``string_split``. At 100 TB this
    is parse-at-query over raw string lakes — the step before
    promoting a feed to typed parquet."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    line = F.concat_ws(
        ",",
        F.col("s_suppkey").cast("string"),
        F.col("s_name"),
        F.col("s_nationkey").cast("string"),
        F.col("s_acctbal").cast("decimal(12,2)").cast("string"),
    )
    kv_str = F.concat(
        F.lit("id:"), F.col("s_suppkey").cast("string"),
        F.lit(",nation:"), F.col("s_nationkey").cast("string"),
    )
    parsed = sup.select(
        "s_suppkey",
        F.from_csv(
            line, "id BIGINT, name STRING, nation BIGINT, acctbal DECIMAL(12,2)"
        ).alias("r"),
        F.str_to_map(kv_str, F.lit(","), F.lit(":")).alias("kv"),
    )
    return parsed.select(
        "s_suppkey",
        F.col("r.id").alias("id"),
        F.col("r.name").alias("name"),
        F.col("r.nation").alias("nation"),
        F.col("r.acctbal").cast("double").alias("acctbal"),
        F.element_at("kv", "nation").cast("bigint").alias("kv_nation"),
    ).orderBy("s_suppkey")


@query(
    "q277_observed_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           MAX(o_custkey) AS max_custkey
    FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("relational", "observability"),
)
def q277_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OBSERVED METRICS (``df.observe`` + ``Observation``) — pipeline
    observability for free: data-quality counters ride the SAME job
    as the transformation (one scan — no second metrics pass over
    100 TB), collected through the query-listener channel, not the
    result. The fixture observes row counts, a threshold counter, a
    DECIMAL-exact sum and a distinct count while the pipeline writes
    its real output to a noop sink; the observed values — returned
    here as a one-row DataFrame — must hash-match the oracle's direct
    aggregation, proving the metrics channel reports exactly what a
    dedicated scan would."""
    from pyspark.sql import Observation

    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    obs = Observation("q277")
    observed = ords.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias(
            "n_large"
        ),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "total_price"
        ),
        F.max(F.col("o_custkey")).alias("max_custkey"),
    )
    # the pipeline's real work runs once; metrics piggyback on the job
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_large"], m["total_price"], m["max_custkey"])],
        "n_rows LONG, n_large LONG, total_price DOUBLE, max_custkey LONG",
    )


@query(
    "q280_mean_family",
    oracle="""
    WITH pos AS (
      SELECT event_type, value FROM events WHERE value > 0
    ),
    t AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS amean,
             SUM(CAST(ROUND(LN(value), 10) AS DECIMAL(18,10))) AS logsum,
             SUM(CAST(ROUND(1.0 / value, 10) AS DECIMAL(18,10))) AS invsum
      FROM pos GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(amean, 6) AS arithmetic_mean,
           ROUND(EXP(CAST(logsum AS DOUBLE) / n), 6) AS geometric_mean,
           ROUND(n / CAST(invsum AS DOUBLE), 6) AS harmonic_mean
    FROM t ORDER BY event_type
    """,
    tags=("relational", "stats"),
)
def q280_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean mean family per event type — arithmetic (DECIMAL
    sum), geometric (exp of the mean log — the right average for
    multiplicative quantities like growth rates), harmonic (the right
    average for rates; always ≤ geometric ≤ arithmetic). Per-term
    rounding to DECIMAL(18,10) before the log/reciprocal sums makes
    the aggregation order-proof (the q256 device) while ln/exp stay
    IEEE-deterministic; one hash aggregation, zero windows."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").filter(
        F.col("value") > 0
    )
    t = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count("*")
        ).alias("amean"),
        F.sum(
            F.round(F.log(F.col("value")), 10).cast("decimal(18,10)")
        ).alias("logsum"),
        F.sum(
            F.round(F.lit(1.0) / F.col("value"), 10).cast("decimal(18,10)")
        ).alias("invsum"),
    )
    return t.select(
        "event_type",
        "n",
        F.round("amean", 6).alias("arithmetic_mean"),
        F.round(F.exp(F.col("logsum").cast("double") / F.col("n")), 6).alias(
            "geometric_mean"
        ),
        F.round(F.col("n") / F.col("invsum").cast("double"), 6).alias(
            "harmonic_mean"
        ),
    ).orderBy("event_type")


@query(
    "q285_percentile_sketch_tier",
    oracle="""
    WITH lim AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi,
             COUNT(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT event_type, n AS n_rows, TRUE AS lo_within, TRUE AS hi_within
    FROM lim ORDER BY event_type
    """,
    tags=("agg", "approx", "quality"),
)
def q285_percentile_sketch_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKETCH tier of the census-gated percentile helper (q257's
    scale path, VERDICT r7 item 7): with the per-key cap forced below
    the fixture's row counts, ``percentile_tiered`` must route to
    ``percentile_approx`` — the one-pass constant-memory KLL-style
    sketch — and the tier choice is asserted in-plan. Correctness is
    the q141 bound gate: each sketched clamp must land within the
    rank-error-implied value window of the exact percentile (computed
    here once for the check; at 100 TB only the sketch runs). The
    oracle states the within-bound invariants as literal TRUE plus
    the exact per-type row counts."""
    from ent_fins_lakehouse_spark.functions.numeric import percentile_tiered

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    lim_raw, tier = percentile_tiered(
        ev, "event_type", "value", [0.05, 0.95], max_exact_rows=10
    )
    if tier != "sketch":
        raise AssertionError(f"expected sketch percentile tier, got {tier}")
    exact = ev.groupBy("event_type").agg(
        F.percentile(
            "value",
            F.array(F.lit(0.03), F.lit(0.07), F.lit(0.93), F.lit(0.97)),
        ).alias("_e"),
        F.count("*").alias("n_rows"),
    )
    # rank-window gate: accuracy=10000 → rank error ≤ n/10000 + 1, and
    # the sketch returns a TRUE data value — so the sketched p05/p95
    # must land inside the exact [p±0.02] rank window (a value window
    # derived from ranks, correct at ANY n — a flat %-of-range bound
    # fails at small n where tail order-statistic gaps are wide)
    return (
        lim_raw.join(exact, "event_type")
        .select(
            "event_type",
            "n_rows",
            (
                (F.col("_pct").getItem(0) >= F.col("_e").getItem(0))
                & (F.col("_pct").getItem(0) <= F.col("_e").getItem(1))
            ).alias("lo_within"),
            (
                (F.col("_pct").getItem(1) >= F.col("_e").getItem(2))
                & (F.col("_pct").getItem(1) <= F.col("_e").getItem(3))
            ).alias("hi_within"),
        )
        .orderBy("event_type")
    )


@query(
    "q289_ordered_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    )
    SELECT 1 AS step, 'view' AS name, COUNT(*) AS n_users FROM s1
    UNION ALL
    SELECT 2 AS step, 'click' AS name, COUNT(*) AS n_users FROM s2
    UNION ALL
    SELECT 3 AS step, 'purchase' AS name, COUNT(*) AS n_users FROM s3
    ORDER BY step
    """,
    tags=("relational", "temporal", "events"),
)
def q289_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis — the product-analytics staple
    (view → click → purchase, each step strictly AFTER the previous
    one for the same user): step 1 is the user's first view; step k
    is the first qualifying event after the user's step-(k−1)
    timestamp. Three min-aggs chained by broadcast-sized per-user
    timestamp joins — every stage keys on user_id, so AQE plans ONE
    exchange layout reused across the chain; nothing is quadratic in
    events. At 100 TB this replaces the self-join-per-step
    formulation (events^k) with k linear passes over a shared
    shuffle."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter("event_type = 'view'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter("event_type = 'click'")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter("event_type = 'purchase'")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    rows = [
        s1.agg(F.lit(1).alias("step"), F.lit("view").alias("name"), F.count("*").alias("n_users")),
        s2.agg(F.lit(2).alias("step"), F.lit("click").alias("name"), F.count("*").alias("n_users")),
        s3.agg(F.lit(3).alias("step"), F.lit("purchase").alias("name"), F.count("*").alias("n_users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


@query(
    "q303_bfs_shortest_path",
    oracle="""
    WITH RECURSIVE
    e AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e2 AS (
      SELECT c AS src, -p AS dst FROM e
      UNION ALL
      SELECT -p AS src, c AS dst FROM e
    ),
    bfs(node, depth) AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION
      SELECT e2.dst, b.depth + 1
      FROM bfs b JOIN e2 ON e2.src = b.node
      WHERE b.depth < 4
    ),
    dist AS (SELECT node, MIN(depth) AS depth FROM bfs GROUP BY node)
    SELECT depth, COUNT(*) AS n_nodes,CAST(SUM(node) AS BIGINT) AS sum_nodes
    FROM dist GROUP BY depth ORDER BY depth
    """,
    tags=("relational", "graph", "iterative"),
)
def q303_bfs_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest path over a REAL edge table — the
    customer↔part co-purchase bipartite graph (part nodes negated to
    disjoint the id spaces), 4 hops from customer 1, min-distance per
    node. The frontier-expansion loop Spark SQL lacks WITH RECURSIVE
    for: each level is one shuffle join frontier⨝edges, a distinct,
    and an anti-join against the visited set, so a node is expanded
    exactly once (the oracle's recursive UNION re-expands per depth —
    same answer, more work: the Spark side IS the scalable form).
    Pregel-loop hygiene per q178: edges persist across iterations,
    each level localCheckpoints to cut lineage. At 100 TB the edge
    table would be bucketed on src so every hop is co-partitioned;
    frontier size is bounded by the node count, never the edge count.
    All-integer output (counts + id sums) — hash-exact by
    construction."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e2 = e.select(F.col("c").alias("src"), (-F.col("p")).alias("dst")).unionByName(
        e.select((-F.col("p")).alias("src"), F.col("c").alias("dst"))
    )
    e2 = e2.persist()
    frontier = spark.createDataFrame([(1, 0)], "node bigint, depth int")
    visited = frontier
    for d in range(1, 5):
        # r15 (guide §3.1): the frontier (≤ the entity universe,
        # KB–MB) and the visited set are the SMALL sides; unhinted,
        # the planner ran BOTH joins as SortMergeJoin, re-shuffling
        # the whole persisted edge relation every level. Broadcasting
        # frontier/visited makes each level one cache read + one
        # small-distinct shuffle, no edge exchange.
        nxt = (
            F.broadcast(frontier).join(e2, frontier.node == e2.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(
                F.broadcast(visited.select("node")), "node", "left_anti"
            )
            .select("node", F.lit(d).alias("depth"))
            .localCheckpoint()
        )
        # each level is already checkpointed; re-checkpointing the
        # growing union copied the whole visited set every round
        # (O(V·depth) materialized bytes over the loop — r14). A union
        # of checkpointed levels reads them back without recompute.
        visited = visited.unionByName(nxt)
        frontier = nxt
        if nxt.isEmpty():
            break
    e2.unpersist(blocking=False)
    return (
        visited.groupBy("depth")
        .agg(F.count("*").alias("n_nodes"), F.sum("node").alias("sum_nodes"))
        .orderBy("depth")
    )


@query(
    "q304_kaplan_meier",
    oracle="""
    WITH base AS (
      SELECT o.o_orderkey,
             date_diff('day', o.o_orderdate, MIN(l.l_shipdate)) AS dur,
             date_diff('day', o.o_orderdate, TIMESTAMP '1998-06-01') AS cens
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate < TIMESTAMP '1998-06-01'
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    obs AS (
      SELECT CASE WHEN dur <= cens THEN dur ELSE cens END AS t,
             CASE WHEN dur <= cens THEN 1 ELSE 0 END AS ev
      FROM base
    ),
    agg AS (
      SELECT t, SUM(ev) AS d, COUNT(*) AS c FROM obs GROUP BY t
    ),
    km1 AS (
      SELECT t, d,CAST(SUM(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      FROM agg
    ),
    km AS (
      SELECT t, d, n_risk,
             SUM(CAST(ROUND(LN(1.0 - CAST(d AS DOUBLE) / n_risk), 10)
                 AS DECIMAL(18,10))) OVER (ORDER BY t) AS logsum
      FROM km1
    )
    SELECT t,CAST(d AS BIGINT) AS n_events, n_risk,
           ROUND(EXP(CAST(logsum AS DOUBLE)), 6) AS survival
    FROM km WHERE d > 0 AND d < n_risk ORDER BY t
    """,
    tags=("relational", "stats", "survival"),
)
def q304_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve with right-censoring — time from
    order placement to FIRST shipment, administratively censored at a
    fixed observation-window end (orders placed close to it may not
    have shipped yet: genuinely censored subjects, not a degenerate
    all-events curve). S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) via the log-sum
    identity with the q280 per-term DECIMAL(18,10) rounding, so the
    running product is order-proof and engine-exact; at-risk counts
    come from ONE descending cumulative window over the per-day event
    histogram — the whole estimator is two hash aggregations plus two
    windows over ≤ a few hundred distinct day values, independent of
    row count (the 100 TB shape: the heavy lifting is the per-subject
    min-shipdate agg, one shuffle on o_orderkey)."""
    W_END = "1998-06-01"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).filter(F.col("o_orderdate") < F.lit(W_END).cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    base = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.datediff("first_ship", "o_orderdate").alias("dur"),
            F.datediff(
                F.lit(W_END).cast("timestamp"), F.col("o_orderdate")
            ).alias("cens"),
        )
    )
    obs = base.select(
        F.when(F.col("dur") <= F.col("cens"), F.col("dur"))
        .otherwise(F.col("cens"))
        .alias("t"),
        F.when(F.col("dur") <= F.col("cens"), 1).otherwise(0).alias("ev"),
    )
    agg = obs.groupBy("t").agg(F.sum("ev").alias("d"), F.count("*").alias("c"))
    w_desc = W.orderBy("t").rowsBetween(W.currentRow, W.unboundedFollowing)
    w_asc = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    km = agg.withColumn("n_risk", F.sum("c").over(w_desc)).withColumn(
        "logsum",
        F.sum(
            F.round(
                F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")), 10
            ).cast("decimal(18,10)")
        ).over(w_asc),
    )
    return (
        km.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
        .select(
            "t",
            F.col("d").alias("n_events"),
            "n_risk",
            F.round(F.exp(F.col("logsum").cast("double")), 6).alias("survival"),
        )
        .orderBy("t")
    )


@query(
    "q305_market_basket_lift",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n_tot AS (SELECT COUNT(DISTINCT okey) AS n FROM basket),
    sup AS (SELECT brand, COUNT(*) AS n_b FROM basket GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_n
      FROM basket a JOIN basket b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, pair_n,
           ROUND(CAST(pair_n AS DOUBLE) * (SELECT n FROM n_tot)
                 / (sa.n_b * sb.n_b), 6) AS lift
    FROM pairs
    JOIN sup sa ON sa.brand = pairs.brand_a
    JOIN sup sb ON sb.brand = pairs.brand_b
    ORDER BY lift DESC, brand_a, brand_b LIMIT 10
    """,
    tags=("relational", "stats", "basket"),
)
def q305_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (support / lift) at the brand
    granularity: baskets are orders' DISTINCT brand sets, candidate
    pairs come from a SELF-JOIN WITHIN basket (co-partitioned on the
    order key — per-basket k² with k ≤ ~7 distinct brands per TPC-H
    order, never basket×basket), lift = P(ab)/(P(a)P(b)) from two
    bounded aggregates. The brand census (|brands|² ≤ 625 pairs) keeps
    the result and the lift join broadcast-sized at ANY corpus scale —
    the same bounded-census device as the dedup family. Lift doubles
    are identical IEEE divisions on both engines; ROUND(6) displays
    them."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    # ONE evaluation of the lineitem⨝part+distinct subtree (r14, guide
    # §1.2): the old shape consumed `basket` four ways (tot, sup, both
    # self-join sides) and the planner reused NOTHING — the plan showed
    # 10 parquet scans and zero ReusedExchange. Grouping each basket's
    # sorted brand set once makes tot a group count, sup an explode of
    # the sets (basket is distinct, so set-explode ≡ basket rows), and
    # the candidate pairs the in-group ordered combinations —
    # per-basket k² with k ≤ ~7, exactly the multiset the
    # `a.brand < b.brand` self-join produced, with no join and no
    # second shuffle of basket. The tiny per-order relation persists.
    g = _swap_persist(
        "q305_brand_sets",
        basket.groupBy("okey").agg(
            F.sort_array(F.collect_set("brand")).alias("brands")
        ),
    )
    tot = g.agg(F.count("*").alias("n_tot"))
    sup = (
        g.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").alias("n_b"))
    )
    pairs = (
        g.select(
            F.explode(
                F.expr(
                    "flatten(transform(brands, (x, i) ->"
                    " transform(slice(brands, i + 2, size(brands)),"
                    " y -> struct(x AS brand_a, y AS brand_b))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b")
        )
        .agg(F.count("*").alias("pair_n"))
    )
    out = (
        pairs.join(
            F.broadcast(sup.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("na"))),
            "brand_a",
        )
        .join(
            F.broadcast(sup.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("nb"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "pair_n",
            F.round(
                F.col("pair_n").cast("double") * F.col("n_tot") / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(10)
    )
    return out


@query(
    "q306_gaps_and_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', day)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY user_id, grp
    )
    SELECT len AS streak_days,
           COUNT(*) AS n_streaks,
           COUNT(DISTINCT user_id) AS n_users
    FROM runs GROUP BY len ORDER BY len
    """,
    tags=("relational", "window", "sessionize"),
)
def q306_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — consecutive-day activity streaks per user
    (the engagement-streak / uptime-run workload): the classic
    ``ordinal − ROW_NUMBER()`` device tags every maximal run of
    consecutive days with a constant group key, turning run detection
    into one hash aggregation; no self-joins, no iterative logic. The
    day ordinal is an epoch day-diff (pure integer), so group keys —
    and the whole result — are engine-exact integers. Scale shape: one
    exchange on user_id shared by the window and both aggregations
    (Catalyst reuses it), per-user day lists are bounded by the
    calendar, and the streak histogram is tiny at any corpus size."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    isl = ev.select(
        "user_id",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(W.partitionBy("user_id").orderBy("day"))
        ).alias("grp"),
    )
    runs = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return (
        runs.groupBy(F.col("len").alias("streak_days"))
        .agg(
            F.count("*").alias("n_streaks"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("streak_days")
    )


@query(
    "q307_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS v,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS wt
      FROM lineitem
    ),
    agg AS (SELECT flag, v, SUM(wt) AS wt FROM w GROUP BY flag, v),
    cum AS (
      SELECT flag, v, wt,
             SUM(wt) OVER (PARTITION BY flag ORDER BY v) AS cw,
             SUM(wt) OVER (PARTITION BY flag) AS tot
      FROM agg
    )
    SELECT flag, MIN(v) AS weighted_median,CAST(MAX(tot) AS BIGINT) AS total_weight_cents
    FROM cum WHERE 2 * cw >= tot GROUP BY flag ORDER BY flag
    """,
    tags=("relational", "stats", "window"),
)
def q307_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per group — the 50% point of the revenue-
    weighted quantity distribution (where percentile_approx and exact
    unweighted percentiles both miss): weights are DECIMAL-exact
    integer cents, the candidate set collapses to one row per DISTINCT
    value first (bounded: |quantities| ≤ 50 per flag), and the median
    is the smallest value whose running weight reaches half the total
    — the ``2·cum ≥ tot`` ALL-INTEGER comparison, so no float boundary
    can flip the pick between engines (the q287 device). Scale shape:
    one hash agg over the raw rows does the heavy lifting; the windows
    run on the collapsed per-(flag, value) table, KBs at any SF."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("v"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("wt"),
    )
    agg = li.groupBy("flag", "v").agg(F.sum("wt").alias("wt"))
    cum = agg.select(
        "flag",
        "v",
        F.sum("wt")
        .over(W.partitionBy("flag").orderBy("v"))
        .alias("cw"),
        F.sum("wt").over(W.partitionBy("flag")).alias("tot"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.min("v").alias("weighted_median"),
            F.max("tot").alias("total_weight_cents"),
        )
        .orderBy("flag")
    )


@query(
    "q309_ks_two_sample",
    oracle="""
    WITH v AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    g AS (SELECT x, SUM(is_c) AS c, SUM(is_p) AS p FROM v GROUP BY x),
    cum AS (
      SELECT SUM(c) OVER (ORDER BY x) AS cc,
             SUM(p) OVER (ORDER BY x) AS cp,
             SUM(c) OVER () AS n1,
             SUM(p) OVER () AS n2
      FROM g
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n_click,CAST(MAX(n2) AS BIGINT) AS n_purchase,CAST(MAX(ABS(cc * n2 - cp * n1)) AS BIGINT) AS d_scaled,
           ROUND(CAST(MAX(ABS(cc * n2 - cp * n1)) AS DOUBLE)
                 / (MAX(n1) * MAX(n2)), 6) AS ks_stat
    FROM cum
    """,
    tags=("relational", "stats"),
)
def q309_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic — are click and
    purchase values drawn from the same distribution? (the drift /
    A-B-test gate PSI (q256) approximates with bins; KS is the exact
    sup-norm). The ECDF difference is compared CROSS-MULTIPLIED:
    ``|cc·n₂ − cp·n₁|`` stays in BIGINT, so the maximum is found over
    exact integers and only the final normalization divides — no float
    ECDF can tie-break differently across engines. Values collapse to
    integer cents first (one hash agg), so the window runs over
    distinct values, not rows. Scale: the cumulative window is a
    single ordered pass over the value histogram — at 100 TB you'd
    range-partition the histogram and prefix-sum per range (the
    standard distributed scan), but the histogram itself is bounded by
    the value domain, not the corpus."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("x"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_c"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    g = ev.groupBy("x").agg(F.sum("is_c").alias("c"), F.sum("is_p").alias("p"))
    w_cum = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = g.select(
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("p").over(w_cum).alias("cp"),
        F.sum("c").over(w_all).alias("n1"),
        F.sum("p").over(w_all).alias("n2"),
    )
    return cum.agg(
        F.max("n1").alias("n_click"),
        F.max("n2").alias("n_purchase"),
        F.max(F.abs(F.col("cc") * F.col("n2") - F.col("cp") * F.col("n1"))).alias(
            "d_scaled"
        ),
        F.round(
            F.max(F.abs(F.col("cc") * F.col("n2") - F.col("cp") * F.col("n1")))
            .cast("double")
            / (F.max("n1") * F.max("n2")),
            6,
        ).alias("ks_stat"),
    )


@query(
    "q310_time_decay_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_type, ts
      FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    cred AS (
      SELECT t.event_type,
             1000000 // CAST(POWER(2, date_diff('day', t.ts, p.p_ts))
                             AS BIGINT) AS w
      FROM p JOIN touch t
        ON t.user_id = p.user_id
       AND t.ts <= p.p_ts
       AND t.ts > p.p_ts - INTERVAL 7 DAY
    )
    SELECT event_type,
           COUNT(*) AS n_touches,CAST(SUM(w) AS BIGINT) AS credit_units,
           ROUND(CAST(SUM(w) AS DOUBLE)
                 / (SELECT SUM(w) FROM cred), 6) AS credit_share
    FROM cred GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "attribution", "join"),
)
def q310_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution with time decay (q237's last-touch
    generalized): every view/click/signup in the 7 days before a
    purchase earns credit HALVED per whole day of distance — and the
    halving is INTEGER (1000000 div 2^days), so credit sums are exact
    across engines and aggregation orders; only the final share
    normalizes in double. The purchase×touch pairing is a per-user
    time-bounded range join (the q27 device: equi-join on user_id
    first, the 7-day band as a post-filter — bounded by per-user
    activity in the window, never events²). One hash agg per channel
    ends it; the share denominator is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    touch = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id", "event_type", "ts"
    )
    cred = (
        p.join(touch, "user_id")
        .filter(
            (F.col("ts") <= F.col("p_ts"))
            & (F.col("ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select(
            "event_type",
            F.expr(
                "1000000 div CAST(pow(2, datediff(p_ts, ts)) AS BIGINT)"
            ).alias("w"),
        )
    )
    tot = cred.agg(F.sum("w").alias("tot"))
    out = (
        cred.groupBy("event_type")
        .agg(F.count("*").alias("n_touches"), F.sum("w").alias("credit_units"))
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_touches",
            "credit_units",
            F.round(F.col("credit_units").cast("double") / F.col("tot"), 6).alias(
                "credit_share"
            ),
        )
        .orderBy("event_type")
    )
    return out


@query(
    "q311_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate), TIMESTAMP '1998-12-31') AS rec,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT NTILE(5) OVER (ORDER BY rec, o_custkey) AS r_q,
             NTILE(5) OVER (ORDER BY freq, o_custkey) AS f_q,
             NTILE(5) OVER (ORDER BY mon, o_custkey) AS m_q,
             mon
      FROM rfm
    )
    SELECT r_q, f_q, m_q,
           COUNT(*) AS n_customers,
           CAST(SUM(mon) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
    tags=("relational", "window", "segmentation"),
)
def q311_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quintiles via NTILE over a DETERMINISTIC total order (metric,
    custkey): NTILE splits by row position, so an underspecified order
    would let tie rows swap buckets between engines; the custkey
    tiebreak pins every row. Monetary sums in DECIMAL. Scale shape:
    one hash agg per customer, then three window passes over the
    per-customer table (each a sort exchange on a constant — at 100 TB
    you'd replace global NTILE with percentile-bound bucketing from
    q285's sketch tier, the documented swap); the 5³ segment grid is
    the output."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-31").cast("timestamp"), F.max("o_orderdate")
        ).alias("rec"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon"),
    )
    scored = rfm.select(
        F.ntile(5).over(W.orderBy("rec", "o_custkey")).alias("r_q"),
        F.ntile(5).over(W.orderBy("freq", "o_custkey")).alias("f_q"),
        F.ntile(5).over(W.orderBy("mon", "o_custkey")).alias("m_q"),
        "mon",
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("mon").cast("double").alias("total_monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@query(
    "q318_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
    ),
    daily AS (SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day),
    all_days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT d.day, COALESCE(n.new_users, 0) AS new_users,CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT) AS cumulative_users
    FROM all_days d LEFT JOIN daily n ON n.day = d.day
    ORDER BY d.day
    """,
    tags=("relational", "window", "growth"),
)
def q318_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth-curve query that
    CANNOT be a windowed COUNT(DISTINCT) (unsupported in window frames
    and quadratic if emulated): each user collapses to a FIRST-SEEN
    day first (one hash agg), daily new-user counts cumulative-sum
    over the calendar — the classic reformulation that turns an
    O(days·users) rescan into one agg + one window over the day
    histogram. All-integer; the left join against the active-day spine
    keeps zero-new-user days in the curve. At 100 TB the heavy part is
    the per-user MIN, one shuffle on user_id; the window runs over ≤
    calendar-many rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    daily = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    spine = ev.select("day").distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .withColumn("cumulative_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


@query(
    "q319_revenue_bridge",
    oracle="""
    WITH yearly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             COUNT(*) AS vol
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT yr, rev, vol,
             LAG(rev) OVER (ORDER BY yr) AS rev0,
             LAG(vol) OVER (ORDER BY yr) AS vol0
      FROM yearly
    )
    SELECT yr,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev - rev0 AS DOUBLE), 2) AS delta_total,
           ROUND((vol - vol0) * (CAST(rev0 AS DOUBLE) / vol0), 6) AS volume_effect,
           ROUND((CAST(rev AS DOUBLE) / vol - CAST(rev0 AS DOUBLE) / vol0) * vol, 6)
             AS price_effect
    FROM lagged WHERE rev0 IS NOT NULL ORDER BY yr
    """,
    tags=("relational", "window", "finance"),
)
def q319_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume revenue bridge (the FP&A waterfall): each year's
    revenue delta decomposes into a VOLUME effect (order-count change
    at the prior year's average ticket) and a PRICE effect (average-
    ticket change at this year's volume) — the standard two-factor
    identity, volume_effect + price_effect = delta exactly. Revenue
    sums in DECIMAL (order-proof); the two divisions are identical
    IEEE operations on both engines, displayed at 6 dp. One hash agg
    to the per-year table, one LAG window over a handful of rows —
    nothing scales with the order count but the first agg."""
    yearly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count("*").alias("vol"),
        )
    )
    w = W.orderBy("yr")
    lagged = yearly.select(
        "yr", "rev", "vol",
        F.lag("rev").over(w).alias("rev0"),
        F.lag("vol").over(w).alias("vol0"),
    ).filter(F.col("rev0").isNotNull())
    return lagged.select(
        "yr",
        F.col("rev").cast("double").alias("revenue"),
        F.round((F.col("rev") - F.col("rev0")).cast("double"), 2).alias("delta_total"),
        F.round(
            (F.col("vol") - F.col("vol0"))
            * (F.col("rev0").cast("double") / F.col("vol0")),
            6,
        ).alias("volume_effect"),
        F.round(
            (
                F.col("rev").cast("double") / F.col("vol")
                - F.col("rev0").cast("double") / F.col("vol0")
            )
            * F.col("vol"),
            6,
        ).alias("price_effect"),
    ).orderBy("yr")


@query(
    "q321_multiset_set_ops",
    oracle="""
    WITH a AS (SELECT l_partkey AS k FROM lineitem WHERE l_linenumber <= 2),
         b AS (SELECT l_partkey AS k FROM lineitem WHERE l_linenumber >= 2)
    SELECT 'intersect_all' AS op, COUNT(*) AS n,CAST(SUM(k) AS BIGINT) AS sum_k
    FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'except_all', COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'union_all', COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
    ORDER BY op
    """,
    tags=("relational", "setops"),
)
def q321_multiset_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — intersectAll / exceptAll (q14/q15's
    bag-semantics halves): duplicates carry their multiplicities
    (INTERSECT ALL keeps min(m,n) copies, EXCEPT ALL max(m−n, 0)),
    which is what reconciliation workloads actually need (distinct set
    ops silently collapse legitimate duplicate facts). Spark plans
    both as a single hash aggregation on (value, count) with a
    generate — one shuffle each, no join; summed-key accounting makes
    the result hash-exact."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_linenumber")
    a = li.filter("l_linenumber <= 2").select(F.col("l_partkey").alias("k"))
    b = li.filter("l_linenumber >= 2").select(F.col("l_partkey").alias("k"))

    def acc(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("op"),
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
        ).select("op", "n", "sum_k")

    return (
        acc(a.intersectAll(b), "intersect_all")
        .unionByName(acc(a.exceptAll(b), "except_all"))
        .unionByName(acc(a.unionAll(b), "union_all"))
        .orderBy("op")
    )


@query(
    "q322_modern_aggregates",
    oracle="""
    SELECT event_type,
           COUNT(*) FILTER (WHERE value > 100) AS n_big,
           BOOL_AND(value > 0) AS all_positive,
           BOOL_OR(value > 300) AS any_huge,
           MODE(CASE WHEN value <= 200 THEN 0 ELSE 1 END) AS mode_bucket,
           MIN(user_id) AS first_user
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("relational", "agg", "functions"),
)
def q322_modern_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern aggregate surface in one hash agg — count_if
    (FILTERed count), bool_and/bool_or (predicate folding, the
    data-quality assertion shape), mode() (most frequent value; keyed
    on a two-bucket split whose majority side strictly dominates in
    every group, so engine tie rules never engage), plus a
    deterministic MIN where any_value would be nondeterministic.
    All-integer/boolean outputs — hash-exact."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "user_id")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 100).alias("n_big"),
            F.bool_and(F.col("value") > 0).alias("all_positive"),
            F.bool_or(F.col("value") > 300).alias("any_huge"),
            F.mode(
                F.when(F.col("value") <= 200, 0).otherwise(1)
            ).alias("mode_bucket"),
            F.min("user_id").alias("first_user"),
        )
        .orderBy("event_type")
    )


@query(
    "q323_percent_of_parent_rollup",
    oracle="""
    WITH leaf AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    ),
    reg AS (SELECT region, SUM(rev) AS reg_rev FROM leaf GROUP BY region),
    tot AS (SELECT SUM(rev) AS total FROM leaf)
    SELECT l.region, l.nation,
           CAST(l.rev AS DOUBLE) AS revenue,
           ROUND(CAST(l.rev AS DOUBLE) / CAST(g.reg_rev AS DOUBLE), 6)
             AS share_of_region,
           ROUND(CAST(g.reg_rev AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
             AS region_share_of_total
    FROM leaf l JOIN reg g ON g.region = l.region CROSS JOIN tot t
    ORDER BY l.region, l.nation
    """,
    tags=("relational", "rollup", "window"),
)
def q323_percent_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchical contribution (the drill-down
    report behind every revenue tree): each nation's share of its
    region and each region's share of the total, computed from ONE
    leaf aggregation with two window re-aggregations over it — no
    second scan, no self-join (the oracle restates them as joins; the
    Spark side uses partition windows over the already-tiny leaf
    table). DECIMAL leaf sums; the two shares are identical IEEE
    divisions, displayed at 6 dp."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    leaf = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w_reg = W.partitionBy("region")
    w_all = W.partitionBy()
    return (
        leaf.withColumn("reg_rev", F.sum("rev").over(w_reg))
        .withColumn("total", F.sum("rev").over(w_all))
        .select(
            "region",
            "nation",
            F.col("rev").cast("double").alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("reg_rev").cast("double"), 6
            ).alias("share_of_region"),
            F.round(
                F.col("reg_rev").cast("double") / F.col("total").cast("double"), 6
            ).alias("region_share_of_total"),
        )
        .orderBy("region", "nation")
    )


@query(
    "q324_dau_mau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             CAST(ts AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             COUNT(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT d.month,
           MAX(m.mau) AS mau,
           CAST(SUM(d.dau) AS BIGINT) AS dau_days,
           ROUND(CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) / MAX(m.mau), 6)
             AS stickiness
    FROM daily d JOIN monthly m ON m.month = d.month
    GROUP BY d.month ORDER BY d.month
    """,
    tags=("relational", "growth", "agg"),
)
def q324_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — the engagement ratio every
    growth dashboard leads with: average daily distinct users over
    monthly distinct users. Two distinct-aggregations (per day, per
    month) over the same user exchange, joined on the month spine;
    integer counts throughout, one final division. At 100 TB both
    distincts are partial-aggregated per user_id before the count —
    Catalyst's expand+two-phase distinct — so the shuffle carries
    (period, user) pairs, never raw events."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("month", "ts")).alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    monthly = ev.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        daily.join(monthly, "month")
        .groupBy("month")
        .agg(
            F.max("mau").alias("mau"),
            F.sum("dau").cast("bigint").alias("dau_days"),
            F.round(
                F.sum("dau").cast("double") / F.count("*") / F.max("mau"), 6
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


@query(
    "q328_cuped_adjustment",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS coin,
             CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                                    THEN CAST(value AS DECIMAL(18,4)) END), 0)
                  AS DECIMAL(18,4)) AS x,
             CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                                    THEN CAST(value AS DECIMAL(18,4)) END), 0)
                  AS DECIMAL(18,4)) AS y
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CASE WHEN coin = 0 THEN 'control' ELSE 'treatment' END AS variant,
             x, y
      FROM per_user
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx
      FROM g
    ),
    byv AS (
      SELECT variant, CAST(COUNT(*) AS DOUBLE) AS nv,
             CAST(SUM(x) AS DOUBLE) AS sxv,
             CAST(SUM(y) AS DOUBLE) AS syv
      FROM g GROUP BY variant
    )
    SELECT variant,
           CAST(nv AS BIGINT) AS n_users,
           ROUND(syv / nv, 6) AS mean_post,
           ROUND(syv / nv - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sxv / nv - sx / n), 6) AS mean_post_cuped,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta
    FROM byv, tot ORDER BY variant
    """,
    tags=("relational", "stats", "experimentation"),
)
def q328_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) — the standard
    A/B-test adjustment: each user's post-period metric is shifted by
    theta·(pre-period metric − its mean), where theta = cov(x,y)/var(x)
    pooled over all users, removing the variance explained by
    pre-experiment behavior. Variant assignment is the engine's
    deterministic md5 coin (same user, same arm, any engine).

    Exactness discipline: per-user x/y and all cross-moments accumulate
    in DECIMAL (order-insensitive), and every double-precision formula
    is the SAME expression text on both engines, so theta and the
    adjusted means match bit-for-bit. Scale shape: one user-keyed
    partial+final agg over events, two tiny aggregates (5 doubles
    total) broadcast back — nothing driver-side, no second scan of the
    raw events."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    dec_v = F.col("value").cast("decimal(18,4)")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ts") < cutoff, dec_v)), F.lit(0)
            )
            .cast("decimal(18,4)")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("ts") >= cutoff, dec_v)), F.lit(0)
            )
            .cast("decimal(18,4)")
            .alias("y"),
        )
        .select(
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                "control",
            )
            .otherwise("treatment")
            .alias("variant"),
            "x",
            "y",
        )
    )
    tot = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxx"),
    )
    byv = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("nv"),
        F.sum("x").cast("double").alias("sxv"),
        F.sum("y").cast("double").alias("syv"),
    )
    return (
        byv.crossJoin(F.broadcast(tot))
        .select(
            "variant",
            F.expr("CAST(nv AS BIGINT)").alias("n_users"),
            F.expr("ROUND(syv / nv, 6)").alias("mean_post"),
            F.expr(
                "ROUND(syv / nv - ((n * sxy - sx * sy) / (n * sxx - sx * sx))"
                " * (sxv / nv - sx / n), 6)"
            ).alias("mean_post_cuped"),
            F.expr(
                "ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)"
            ).alias("theta"),
        )
        .orderBy("variant")
    )


@query(
    "q332_mann_kendall_trend",
    oracle="""
    WITH monthly AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mo,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(SIGN(b.rev - a.rev) AS BIGINT) AS sgn,
             CAST(b.rev - a.rev AS DOUBLE) / CAST(b.mo - a.mo AS DOUBLE)
               AS slope
      FROM monthly a JOIN monthly b ON b.mo > a.mo
    ),
    agg AS (
      SELECT (SELECT COUNT(*) FROM monthly) AS n,
             CAST(SUM(sgn) AS BIGINT) AS s_stat,
             ROUND(CAST(median(slope) AS DOUBLE), 6) AS theil_sen_slope
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_periods, s_stat, theil_sen_slope,
           ROUND(CASE
             WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(n*(n-1.0)*(2*n+5)/18.0)
             WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(n*(n-1.0)*(2*n+5)/18.0)
             ELSE 0.0 END, 6) AS z_score,
           CASE
             WHEN ABS(CASE
               WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(n*(n-1.0)*(2*n+5)/18.0)
               WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(n*(n-1.0)*(2*n+5)/18.0)
               ELSE 0.0 END) > 1.96
             THEN CASE WHEN s_stat > 0 THEN 'increasing' ELSE 'decreasing' END
             ELSE 'no-trend' END AS trend
    FROM agg
    """,
    tags=("relational", "stats", "trend"),
)
def q332_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall SIGNIFICANCE test + Theil-Sen slope over monthly
    revenue — the inference half q261's per-event-type screen stops
    short of: the same non-parametric S = sum of sign(rev_j - rev_i)
    over month pairs i<j, but carried through the no-ties variance
    n(n-1)(2n+5)/18 to a continuity-corrected z and a +-1.96
    increasing / decreasing / no-trend verdict (q261 reports tau and
    slope per key; this answers "is the trend REAL"). The robust slope
    = MEDIAN of pairwise slopes, resisting outlier months that wreck
    least squares.

    Exactness: revenue aggregates in DECIMAL; sign() is computed on
    the exact decimal difference (integer-exact S); only the slopes
    and z go through double, with the SAME expression text both
    engines and a 6-dp round. Scale shape: the O(n^2) pair join runs
    on the AGGREGATED month spine (~84 rows -> ~3.5k pairs), never on
    raw orders — at 100 TB the only data-sized pass is the one
    partial-aggregated groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mo")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = a.join(b, F.col("b.mo") > F.col("a.mo")).select(
        F.signum((F.col("b.rev") - F.col("a.rev")).cast("double"))
        .cast("long")
        .alias("sgn"),
        (
            (F.col("b.rev") - F.col("a.rev")).cast("double")
            / (F.col("b.mo") - F.col("a.mo")).cast("double")
        ).alias("slope"),
    )
    n_periods = monthly.count()
    agg = pairs.agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.round(F.expr("CAST(percentile(slope, 0.5) AS DOUBLE)"), 6).alias(
            "theil_sen_slope"
        ),
    ).withColumn("n", F.lit(n_periods).cast("long"))
    z = (
        "CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(n*(n-1.0)*(2*n+5)/18.0) "
        "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(n*(n-1.0)*(2*n+5)/18.0) "
        "ELSE 0.0 END"
    )
    return agg.select(
        F.col("n").alias("n_periods"),
        "s_stat",
        "theil_sen_slope",
        F.round(F.expr(z), 6).alias("z_score"),
        F.expr(
            f"CASE WHEN ABS({z}) > 1.96 THEN "
            "CASE WHEN s_stat > 0 THEN 'increasing' ELSE 'decreasing' END "
            "ELSE 'no-trend' END"
        ).alias("trend"),
    )


@query(
    "q333_chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type, EXTRACT(dow FROM ts) + 1 AS dow, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_tot,
             SUM(o) OVER (PARTITION BY dow) AS col_tot,
             SUM(o) OVER () AS n
      FROM obs
    ),
    cells AS (
      SELECT event_type, dow, o,
             CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
               / CAST(n AS DOUBLE) AS e
      FROM tot
    )
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_dows,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
           ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2
    FROM cells
    """,
    tags=("relational", "stats", "independence"),
)
def q333_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence: is event_type
    distributed independently of day-of-week? Contingency counts O,
    expected E = row_total * col_total / N under independence, chi2 =
    sum (O-E)^2/E with dof = (r-1)(c-1) — the first screen every
    behavioral-data audit runs before trusting a segmentation.

    Day-of-week convention pinned explicitly: Spark's dayofweek() is
    1=Sunday..7, DuckDB's EXTRACT(dow) is 0=Sunday..6 — the oracle
    adds 1 so both engines bucket identically. All inputs to the
    double formula are exact integer counts and the expression text is
    identical on both sides, so chi2 matches to the bit before the
    6-dp round. Scale shape: ONE hash agg over events (the |types| x 7
    contingency), then window sums over the tiny cell table — nothing
    after the first agg touches data-sized rows."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(W.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    cells = tot.withColumn(
        "e",
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double"),
    )
    return cells.agg(
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.countDistinct("dow").cast("long").alias("n_dows"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
    )


@query(
    "q340_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
                  THEN CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 1.5
                            AS DECIMAL(21,3))
                  ELSE CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                            AS DECIMAL(21,3)) END AS rev
      FROM orders GROUP BY 1
    ),
    moments AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(rev AS DECIMAL(24,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(CAST(rev AS DECIMAL(24,6))
                           * CAST(rev AS DECIMAL(24,6)) AS DECIMAL(38,6)))
                  AS DOUBLE) AS sxx
      FROM daily WHERE day < DATE '1996-01-01'
    ),
    params AS (
      SELECT CAST(ROUND(sx / n, 6) AS DECIMAL(24,6)) AS mu,
             CAST(ROUND(0.5 * sqrt((sxx - sx * sx / n) / (n - 1.0)), 6)
                  AS DECIMAL(24,6)) AS ksig,
             CAST(ROUND(5.0 * sqrt((sxx - sx * sx / n) / (n - 1.0)), 6)
                  AS DECIMAL(24,6)) AS thresh
      FROM moments
    ),
    pref AS (
      SELECT day, thresh,
             CAST(SUM(CAST(rev AS DECIMAL(24,6)) - mu - ksig)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS DECIMAL(30,6)) AS p
      FROM daily, params
    ),
    cusum AS (
      SELECT day, thresh,
             p - LEAST(CAST(0 AS DECIMAL(30,6)),
                       MIN(p) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))
               AS s
      FROM pref
    )
    SELECT (SELECT COUNT(*) FROM daily) AS n_days,
           MIN(day) AS first_alarm_day,
           ROUND((SELECT CAST(MAX(s) AS DOUBLE) FROM cusum), 4) AS max_cusum
    FROM cusum WHERE s > thresh
    """,
    tags=("relational", "stats", "changepoint", "monitoring"),
)
def q340_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954) over daily revenue —
    the monitoring primitive behind drift alarms: S_t = max(0,
    S_{t-1} + (x_t − μ − kσ)), alarm when S_t > hσ. The recursion
    looks inherently sequential, but the classic identity S_t = P_t −
    min(0, min_{j≤t} P_j) over the drift-adjusted PREFIX sums turns it
    into two window passes (cumulative sum + running min) — fully
    parallel prefix shapes Spark executes without a UDF or a loop,
    identical SQL on both engines.

    The fixture plants a 1.5× level shift from 1996-01-01; μ/σ
    calibrate on the pre-shift period only (the monitoring contract —
    the baseline must not see the anomaly), k=0.5σ drift allowance,
    h=5σ threshold. Scale shape: one hash agg to the day spine, then
    windows over ~2.4k rows; the only data-sized pass is the daily
    aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1996-01-01").cast("date")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("raw"))
        .select(
            "day",
            F.when(
                F.col("day") >= cut,
                # decimal literal times decimal, kept at 3 decimals:
                # NO rounding anywhere (a cast back to 2dp lands on the
                # exact .xx5 boundary, where Spark rounds half-up and
                # DuckDB half-even)
                (F.col("raw") * F.lit("1.5").cast("decimal(2,1)")).cast(
                    "decimal(21,3)"
                ),
            )
            .otherwise(F.col("raw").cast("decimal(21,3)"))
            .alias("rev"),
        )
    )
    # μ and the drift/threshold terms are frozen to DECIMAL constants
    # so the prefix sums accumulate EXACTLY — a windowed double sum is
    # summation-order-dependent (DuckDB's segment-tree vs Spark's
    # running sum disagree in the last bits); decimal is order-free
    # μ/σ from EXACT decimal moments (sums of rev and rev² are
    # order-insensitive), THEN one double formula with identical text
    # on both engines — a native STDDEV differs across engines at the
    # 1e-9 relative level, which a 2.4k-day prefix sum amplifies
    dec_rev = F.col("rev").cast("decimal(24,6)")
    moments = daily.filter(F.col("day") < cut).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec_rev).cast("double").alias("sx"),
        F.sum((dec_rev * dec_rev).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
    )
    sig = "sqrt((sxx - sx * sx / n) / (n - 1.0))"
    params = moments.select(
        F.expr("CAST(ROUND(sx / n, 6) AS DECIMAL(24,6))").alias("mu"),
        F.expr(f"CAST(ROUND(0.5 * {sig}, 6) AS DECIMAL(24,6))").alias("ksig"),
        F.expr(f"CAST(ROUND(5.0 * {sig}, 6) AS DECIMAL(24,6))").alias("thresh"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    pref = daily.crossJoin(F.broadcast(params)).select(
        "day",
        "thresh",
        F.sum(F.col("rev").cast("decimal(24,6)") - F.col("mu") - F.col("ksig"))
        .over(w)
        .cast("decimal(30,6)")
        .alias("p"),
    )
    cusum = pref.select(
        "day",
        "thresh",
        (
            F.col("p")
            - F.least(F.lit(0).cast("decimal(30,6)"), F.min("p").over(w))
        ).alias("s"),
    )
    n_days = daily.count()
    alarms = cusum.filter(F.col("s") > F.col("thresh"))
    peak = cusum.agg(F.round(F.max("s").cast("double"), 4).alias("max_cusum"))
    return (
        alarms.agg(F.min("day").alias("first_alarm_day"))
        .crossJoin(peak)
        .select(
            F.lit(n_days).cast("long").alias("n_days"),
            "first_alarm_day",
            "max_cusum",
        )
    )


@query(
    "q348_seasonal_decomposition",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    dense AS (
      SELECT s.d, CAST(COALESCE(n, 0) AS BIGINT) AS n
      FROM spine s LEFT JOIN daily USING (d)
    ),
    t0 AS (
      SELECT d, n,
             SUM(n) OVER w AS sum7, COUNT(*) OVER w AS w_n,
             CAST(dayofweek(d) AS BIGINT) AS dow
      FROM dense
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    def AS (
      SELECT d, n, CAST(sum7 AS BIGINT) AS sum7, dow FROM t0 WHERE w_n = 7
    ),
    seas AS (
      SELECT dow, COUNT(*) AS n_days,
             CAST(SUM(n) AS BIGINT) AS sn, CAST(SUM(sum7) AS BIGINT) AS ss
      FROM def GROUP BY dow
    ),
    seas2 AS (
      SELECT dow, n_days,
             CAST(7 * sn - ss AS DOUBLE) / CAST(7 * n_days AS DOUBLE) AS seasonal
      FROM seas
    ),
    r AS (
      SELECT def.dow, s.n_days, s.seasonal,
             (CAST(n AS DOUBLE) - CAST(sum7 AS DOUBLE) / 7.0) - s.seasonal AS resid
      FROM def JOIN seas2 s ON def.dow = s.dow
    )
    SELECT dow, n_days, seasonal,
           MIN(resid) AS min_resid, MAX(resid) AS max_resid
    FROM r GROUP BY dow, n_days, seasonal ORDER BY dow
    """,
    tags=("relational", "temporal", "timeseries"),
)
def q348_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ADDITIVE seasonal decomposition (trend / seasonal /
    residual — the moving-average construction STL refines) of the
    daily event-count series, weekly period: trend = centered 7-day
    moving average over a DENSE date spine (missing days count 0;
    edge days with <7-row windows get NULL trend, the textbook rule),
    seasonal = per-weekday mean of the detrended series, residual =
    detrended − seasonal. Output: per weekday, the seasonal index and
    the residual envelope (min/max — order-insensitive extremes).

    Cross-engine exactness device: every AGGREGATION stays in 64-bit
    integers (Σn, Σsum7 — the window sum of counts is itself an
    integer), and the only floating-point steps are per-row IEEE
    arithmetic written in the SAME operation order on both sides —
    seasonal = (7·Σn − Σsum7)/(7·c) as one correctly-rounded double
    division, resid = (n − sum7/7) − seasonal. No double is ever
    summed across rows, so partial-aggregation order cannot drift the
    hash (the q140 discipline, integer edition). Weekday convention
    pinned: Spark ``dayofweek−1`` = DuckDB ``dayofweek`` (0=Sunday,
    the q333 device).

    Scale shape: the series is ONE aggregate row per day — KB-sized
    at any event volume; the unpartitioned window runs on one task by
    design (a per-series key partitions it for panel data). The heavy
    work — daily counting — is a partial-agg groupBy pushed to the
    scan."""
    ev = load_table(spark, sf_dir, "events").select(F.col("ts").cast("date").alias("d"))
    # r14 (guide §5): daily (one row per day, KB-sized) feeds the
    # bounds-spine aggregate AND the dense left join, and t (same
    # cardinality) feeds the seasonal aggregate AND the residual join —
    # unpersisted, the events scan + daily groupBy ran FOUR times
    # (2 consumers × 2 consumers). Persisting both day-sized relations
    # leaves exactly ONE events pass.
    daily = _swap_persist(
        "q348_daily", ev.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"))
    )
    dense = spine.join(daily, "d", "left").select(
        "d", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w = W.orderBy("d").rowsBetween(-3, 3)
    t = _swap_persist(
        "q348_trend",
        dense.select(
            "d",
            "n",
            F.sum("n").over(w).alias("sum7"),
            F.count(F.lit(1)).over(w).alias("w_n"),
            (F.dayofweek("d") - 1).cast("long").alias("dow"),
        )
        .filter("w_n = 7")
        .drop("w_n"),
    )
    seas = (
        t.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("sn"),
            F.sum("sum7").alias("ss"),
        )
        .select(
            "dow",
            "n_days",
            (
                (7 * F.col("sn") - F.col("ss")).cast("double")
                / (7 * F.col("n_days")).cast("double")
            ).alias("seasonal"),
        )
    )
    r = t.join(F.broadcast(seas), "dow").withColumn(
        "resid",
        (F.col("n").cast("double") - F.col("sum7").cast("double") / F.lit(7.0))
        - F.col("seasonal"),
    )
    return (
        r.groupBy("dow", "n_days", "seasonal")
        .agg(F.min("resid").alias("min_resid"), F.max("resid").alias("max_resid"))
        .orderBy("dow")
    )


@query(
    "q350_event_transition_matrix",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
    FROM c ORDER BY from_type, to_type
    """,
    tags=("relational", "behavioral", "markov"),
)
def q350_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov TRANSITION MATRIX over per-user event
    sequences — the state-migration analysis behind delinquency
    roll-rate models (current→30dpd→60dpd→default), computed here on
    the event stream's type transitions: P(to | from) = n(from→to) /
    n(from→*). One lead() window per user (ties broken by the unique
    event_id so successor pairs are engine-independent), one hash agg
    on the |types|² ≤ bounded cell grid, then a row-normalizing window
    over the TINY cell table. The probability is a single IEEE
    division of two exact integers — bit-portable, no double ever
    summed. Scale: the only data-sized exchange is the user_id
    window; everything after operates on |types|² rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    c = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wrow = W.partitionBy("from_type")
    return (
        c.select(
            "from_type",
            "to_type",
            "n",
            (
                F.col("n").cast("double")
                / F.sum("n").over(wrow).cast("double")
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "q351_loan_amortization",
    oracle="""
    WITH loans AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS principal,
             CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 0.010
                  WHEN o_orderpriority = '2-HIGH' THEN 0.009
                  WHEN o_orderpriority = '3-MEDIUM' THEN 0.008
                  WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 0.007
                  ELSE 0.006 END AS DOUBLE) AS r
      FROM orders WHERE o_orderkey <= 100
    ),
    sched AS (
      SELECT o_orderkey, principal, r, CAST(k AS BIGINT) AS month,
             list_reduce(
               list_transform(generate_series(1, k), x -> 1.0 + r),
               (a, b) -> a * b
             ) AS fk
      FROM loans, generate_series(1, 12) AS gs(k)
    ),
    calc AS (
      SELECT o_orderkey, month, principal, r, fk,
             fk / (1.0 + r) AS fprev,
             principal * r / (1.0 - 1.0 / list_reduce(
               list_transform(generate_series(1, 12), x -> 1.0 + r),
               (a, b) -> a * b
             )) AS pay
      FROM sched
    )
    SELECT o_orderkey, month,
           pay AS payment,
           (principal * fprev - pay * (fprev - 1.0) / r) * r AS interest,
           principal * fk - pay * (fk - 1.0) / r AS balance
    FROM calc ORDER BY o_orderkey, month
    """,
    tags=("relational", "finance"),
)
def q351_loan_amortization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-rate LOAN AMORTIZATION schedule — the lending-domain
    expansion the reference's loan-risk tables feed (principal =
    order value, priority-tiered monthly rate, 12-month annuity):
    payment A = P·r/(1−(1+r)^-n), per-month interest = B_{k-1}·r and
    remaining balance B_k = P·f_k − A·(f_k−1)/r with f_k = (1+r)^k.

    Cross-engine exactness device: NO libm pow — f_k is a LEFT fold
    of k IEEE multiplications (Spark ``aggregate`` over
    ``sequence(1,k)``; DuckDB ``list_reduce`` without init — the
    1.0-init vs no-init difference is exact because 1.0·x ≡ x), and
    every derived number is per-ROW arithmetic in pinned operation
    order: nothing is aggregated, so nothing is partition-order
    sensitive. f_{k−1} comes from one division f_k/(1+r) (sequence(1,0)
    would generate DESCENDING in Spark — the fold is never run at
    k=0).

    Scale shape: a map-only explode (fan-out 12) over the loan scan —
    embarrassingly parallel, no shuffle but the final ORDER BY."""
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey <= 100")
    loans = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("principal"),
        F.expr(
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 0.010D"
            " WHEN o_orderpriority = '2-HIGH' THEN 0.009D"
            " WHEN o_orderpriority = '3-MEDIUM' THEN 0.008D"
            " WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 0.007D"
            " ELSE 0.006D END"
        ).alias("r"),
    )
    fold = (
        "aggregate(transform(sequence(1, {ub}), x -> CAST(1.0D + r AS DOUBLE)),"
        " CAST(1.0D AS DOUBLE), (acc, x) -> acc * x)"
    )
    sched = loans.select(
        "*", F.explode(F.expr("sequence(1, 12)")).alias("k")
    ).select(
        "o_orderkey",
        "principal",
        "r",
        F.col("k").cast("long").alias("month"),
        F.expr(fold.format(ub="k")).alias("fk"),
        F.expr(f"{fold.format(ub='12')}").alias("f12"),
    )
    calc = sched.select(
        "o_orderkey",
        "month",
        "principal",
        "r",
        "fk",
        (F.col("fk") / (F.lit(1.0) + F.col("r"))).alias("fprev"),
        (
            F.col("principal") * F.col("r")
            / (F.lit(1.0) - F.lit(1.0) / F.col("f12"))
        ).alias("pay"),
    )
    return calc.select(
        "o_orderkey",
        "month",
        F.col("pay").alias("payment"),
        (
            (
                F.col("principal") * F.col("fprev")
                - F.col("pay") * (F.col("fprev") - F.lit(1.0)) / F.col("r")
            )
            * F.col("r")
        ).alias("interest"),
        (
            F.col("principal") * F.col("fk")
            - F.col("pay") * (F.col("fk") - F.lit(1.0)) / F.col("r")
        ).alias("balance"),
    ).orderBy("o_orderkey", "month")


@query(
    "q352_historical_var",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS rev
      FROM events GROUP BY 1
    ),
    pnl AS (
      SELECT d, rev - LAG(rev) OVER (ORDER BY d) AS pnl FROM daily
    ),
    p AS (SELECT d, pnl FROM pnl WHERE pnl IS NOT NULL),
    r AS (
      SELECT pnl, ROW_NUMBER() OVER (ORDER BY pnl, d) AS rn,
             COUNT(*) OVER () AS n
      FROM p
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           MAX(CASE WHEN rn = CAST(CEIL(0.05 * n) AS BIGINT) THEN pnl END) AS var95,
           MAX(CASE WHEN rn = CAST(CEIL(0.01 * n) AS BIGINT) THEN pnl END) AS var99,
           MIN(pnl) AS worst, MAX(pnl) AS best
    FROM r
    """,
    tags=("relational", "finance", "risk"),
)
def q352_historical_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTORICAL-SIMULATION Value-at-Risk over the daily revenue
    P&L series: VaR₉₅/VaR₉₉ as ORDER STATISTICS (the ⌈α·n⌉-th
    smallest day-over-day change — no interpolation, so the statistic
    is an exact element of the sample and hashes bit-for-bit), plus
    the worst/best single-day moves. The daily series is summed in
    DECIMAL then final-cast to DOUBLE (the q140 discipline), the P&L
    is a per-row IEEE subtraction, and ties in the ranking are broken
    by date — every step is partition-order-free.

    Scale shape: the only data-sized work is the daily groupBy
    (partial-agg pushed to the scan); the ranking window runs over
    ONE ROW PER DAY — KB-sized at any event volume. For a panel of
    books/desks, partition the ranking window by the book key."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    daily = ev.groupBy("d").agg(F.sum("v").cast("double").alias("rev"))
    wd = W.orderBy("d")
    p = (
        daily.select("d", (F.col("rev") - F.lag("rev").over(wd)).alias("pnl"))
        .filter(F.col("pnl").isNotNull())
    )
    r = p.select(
        "pnl",
        F.row_number().over(W.orderBy("pnl", "d")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    k = lambda a: F.ceil(F.lit(a) * F.col("n")).cast("long")  # noqa: E731
    return r.agg(
        F.max("n").cast("long").alias("n_days"),
        F.max(F.when(F.col("rn") == k(0.05), F.col("pnl"))).alias("var95"),
        F.max(F.when(F.col("rn") == k(0.01), F.col("pnl"))).alias("var99"),
        F.min("pnl").alias("worst"),
        F.max("pnl").alias("best"),
    )


@query(
    "q353_vintage_curves",
    oracle="""
    WITH j AS (
      SELECT strftime(o.o_orderdate, '%Y-%m') AS cohort,
             (CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) * 12
                + CAST(EXTRACT(month FROM l.l_shipdate) AS BIGINT))
             - (CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) * 12
                + CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT)) AS offs,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE EXTRACT(year FROM o.o_orderdate) = 1995
    ),
    cells AS (
      SELECT cohort, offs, COUNT(*) AS n_items,
             CAST(SUM(ret) AS BIGINT) AS n_ret
      FROM j GROUP BY cohort, offs
    ),
    cum AS (
      SELECT cohort, offs, n_items,
             SUM(n_ret) OVER (
               PARTITION BY cohort ORDER BY offs
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_ret,
             SUM(n_items) OVER (PARTITION BY cohort) AS total_items
      FROM cells
    )
    SELECT cohort, offs, n_items,
           CAST(cum_ret AS BIGINT) AS cum_ret,
           CAST(cum_ret AS DOUBLE) / CAST(total_items AS DOUBLE) AS cum_return_rate
    FROM cum ORDER BY cohort, offs
    """,
    tags=("relational", "finance", "cohort"),
)
def q353_vintage_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VINTAGE CURVES — the lending-book loss-emergence view (per
    origination cohort, cumulative bad rate by months-on-book),
    computed as cumulative RETURN rate per order-month cohort by
    ship-month offset. Pure integer machinery: month ordinals are
    y·12+m integers, the cumulative numerator is a window sum of
    integer counts, and the rate is one IEEE division of two exact
    integers — nothing float is ever aggregated.

    Scale shape: one shuffle for the orderkey join (broadcast-eligible
    when a cohort slice is small), one hash agg to the
    |cohorts|×|offsets| cell grid, then windows over that TINY grid.
    The 1995 cohort filter both bounds the output and pushes into the
    orders scan (PushedFilters on o_orderdate)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter("year(o_orderdate) = 1995")
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("cohort"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("om"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("long").alias("sm"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "cohort", (F.col("sm") - F.col("om")).alias("offs"), "ret"
    )
    cells = j.groupBy("cohort", "offs").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("ret").cast("long").alias("n_ret"),
    )
    wcum = (
        W.partitionBy("cohort")
        .orderBy("offs")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy("cohort")
    return (
        cells.select(
            "cohort",
            "offs",
            "n_items",
            F.sum("n_ret").over(wcum).cast("long").alias("cum_ret"),
            (
                F.sum("n_ret").over(wcum).cast("double")
                / F.sum("n_items").over(wtot).cast("double")
            ).alias("cum_return_rate"),
        )
        .orderBy("cohort", "offs")
    )


@query(
    "q355_mann_whitney_u",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS grp,
             value AS v
      FROM events WHERE event_type IN ('click', 'view')
    ),
    r AS (
      SELECT grp,
             RANK() OVER (ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY v) AS tcnt
      FROM s
    ),
    g AS (
      SELECT grp, COUNT(*) AS n,
             CAST(SUM(2 * rk + tcnt - 1) AS BIGINT) AS r2
      FROM r GROUP BY grp
    ),
    t AS (
      SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS tsum
      FROM (SELECT COUNT(*) AS c FROM s GROUP BY v)
    ),
    w AS (
      SELECT CAST(MAX(CASE WHEN grp = 1 THEN n END) AS BIGINT) AS n1,
             CAST(MAX(CASE WHEN grp = 2 THEN n END) AS BIGINT) AS n2,
             MAX(CASE WHEN grp = 1 THEN r2 END) AS r21
      FROM g
    )
    SELECT n1, n2,
           CAST(r21 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
           CAST(n1 * n2 AS DOUBLE)
             - CAST(r21 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u2,
           (CAST(r21 - n1 * (n1 + 1) AS DOUBLE) / 2.0
              - CAST(n1 * n2 AS DOUBLE) / 2.0)
             / SQRT(CAST(n1 * n2 AS DOUBLE) / 12.0
                    * (CAST(n1 + n2 + 1 AS DOUBLE)
                       - CAST(tsum AS DOUBLE)
                         / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE))) AS z
    FROM w, t
    """,
    tags=("relational", "abtest", "stats"),
)
def q355_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U (Wilcoxon rank-sum) — the nonparametric
    two-sample test the A/B family was missing beside CUPED (q328) and
    chi-square (q333): are 'click' values stochastically larger than
    'view' values? U₁ = R₁ − n₁(n₁+1)/2 with MIDRANKS for ties and
    the tie-corrected normal approximation
    z = (U₁ − n₁n₂/2) / √(n₁n₂/12 · (N+1 − Σ(t³−t)/(N(N−1)))).

    Cross-engine exactness device: midranks are kept as INTEGERS by
    carrying 2·midrank = 2·rank + tieCount − 1 (rank() gives the tie
    group's minimum; adding (t−1)/2 gives the midrank), so every
    aggregation — rank sums, the tie correction Σ(t³−t) — is exact
    64-bit arithmetic, and the statistic is a handful of per-scalar
    IEEE ops in pinned order (division and sqrt are correctly-rounded,
    unlike libm transcendentals). The ranking window is global by
    construction (one combined sample) — a grouped A/B panel
    partitions it by experiment key."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = ev.select(
        F.when(F.col("event_type") == "click", 1).otherwise(2).alias("grp"),
        F.col("value").alias("v"),
    )
    r = s.select(
        "grp",
        F.rank().over(W.orderBy("v")).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("v")).alias("tcnt"),
    )
    g = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(2 * F.col("rk") + F.col("tcnt") - 1).cast("long").alias("r2"),
    )
    t = (
        s.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
            .cast("long")
            .alias("tsum")
        )
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).cast("long").alias("n1"),
        F.max(F.when(F.col("grp") == 2, F.col("n"))).cast("long").alias("n2"),
        F.max(F.when(F.col("grp") == 1, F.col("r2"))).alias("r21"),
    )
    j = w.crossJoin(t)  # 1x1
    n1, n2, r21, tsum = F.col("n1"), F.col("n2"), F.col("r21"), F.col("tsum")
    u1 = (r21 - n1 * (n1 + 1)).cast("double") / F.lit(2.0)
    mu = (n1 * n2).cast("double") / F.lit(2.0)
    nn = n1 + n2
    var = (n1 * n2).cast("double") / F.lit(12.0) * (
        (nn + 1).cast("double") - tsum.cast("double") / (nn * (nn - 1)).cast("double")
    )
    return j.select(
        "n1",
        "n2",
        u1.alias("u1"),
        ((n1 * n2).cast("double") - u1).alias("u2"),
        ((u1 - mu) / F.sqrt(var)).alias("z"),
    )


@query(
    "q356_t_closeness",
    oracle="""
    WITH grid AS (
      SELECT n.c_nationkey, s.c_mktsegment
      FROM (SELECT DISTINCT c_nationkey FROM customer) n
      CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
    ),
    cells AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_ci
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    dense AS (
      SELECT g.c_nationkey, g.c_mktsegment,
             CAST(COALESCE(n_ci, 0) AS BIGINT) AS n_ci
      FROM grid g LEFT JOIN cells USING (c_nationkey, c_mktsegment)
    ),
    tot AS (
      SELECT d.*,
             SUM(n_ci) OVER (PARTITION BY c_nationkey) AS n_c,
             SUM(n_ci) OVER (PARTITION BY c_mktsegment) AS n_gi,
             SUM(n_ci) OVER () AS n
      FROM dense d
    ),
    diffs AS (
      SELECT c_nationkey,
             CAST(MAX(n_c) AS BIGINT) AS class_size,
             list(
               ABS(CAST(n_ci AS DOUBLE) / CAST(n_c AS DOUBLE)
                   - CAST(n_gi AS DOUBLE) / CAST(n AS DOUBLE))
               ORDER BY c_mktsegment
             ) AS ds
      FROM tot GROUP BY c_nationkey
    )
    SELECT c_nationkey, class_size,
           0.5 * list_reduce(ds, (a, b) -> a + b) AS tvd
    FROM diffs ORDER BY c_nationkey
    """,
    tags=("relational", "privacy"),
)
def q356_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS — the third rung of the anonymity ladder after
    k-anonymity and l-diversity: for each quasi-identifier class
    (nation), the distance between its SENSITIVE-attribute
    distribution (market segment) and the global one must not exceed
    t. For a categorical attribute with uniform ground distance the
    Earth Mover's Distance reduces to total variation:
    TVD = ½·Σᵢ|p(i|class) − q(i)| — including the |0 − qᵢ| terms for
    segments ABSENT from a class, which is why the computation runs
    over the DENSE class×value grid (bounded |QI|·|values| cells),
    never just the observed cells.

    Cross-engine exactness device: the five |p−q| terms per class are
    summed by a PINNED-ORDER fold over the segment-sorted list (Spark
    ``aggregate`` over ``array_sort``, DuckDB ordered ``list`` +
    init-less ``list_reduce`` — exact because 0.0+x ≡ x), so the
    only floating-point steps are per-cell divisions and an
    order-fixed 5-term sum. Scale: one hash agg to the cell grid;
    every window/fold runs on the bounded grid."""
    c = load_table(spark, sf_dir, "customer")
    grid = (
        c.select("c_nationkey").distinct()
        .crossJoin(c.select("c_mktsegment").distinct())
    )
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_ci")
    )
    dense = grid.join(cells, ["c_nationkey", "c_mktsegment"], "left").select(
        "c_nationkey",
        "c_mktsegment",
        F.coalesce("n_ci", F.lit(0)).cast("long").alias("n_ci"),
    )
    tot = dense.select(
        "*",
        F.sum("n_ci").over(W.partitionBy("c_nationkey")).alias("n_c"),
        F.sum("n_ci").over(W.partitionBy("c_mktsegment")).alias("n_gi"),
        F.sum("n_ci").over(W.partitionBy()).alias("n"),
    )
    diffs = tot.select(
        "c_nationkey",
        "n_c",
        "c_mktsegment",
        F.abs(
            F.col("n_ci").cast("double") / F.col("n_c").cast("double")
            - F.col("n_gi").cast("double") / F.col("n").cast("double")
        ).alias("d"),
    )
    per_class = diffs.groupBy("c_nationkey").agg(
        F.max("n_c").cast("long").alias("class_size"),
        F.array_sort(F.collect_list(F.struct("c_mktsegment", "d"))).alias("ds"),
    )
    return (
        per_class.select(
            "c_nationkey",
            "class_size",
            (
                F.lit(0.5)
                * F.expr(
                    "aggregate(transform(ds, s -> s.d), CAST(0.0D AS DOUBLE),"
                    " (acc, x) -> acc + x)"
                )
            ).alias("tvd"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q357_log_rank_test",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 2 END AS grp,
             DATEDIFF('day', o.o_orderdate, MIN(l.l_shipdate)) AS dur,
             DATEDIFF('day', o.o_orderdate, DATE '1998-06-01') AS cens
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderdate < TIMESTAMP '1998-06-01'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ),
    subj AS (
      SELECT grp, LEAST(dur, cens) AS obs,
             CASE WHEN dur <= cens THEN 1 ELSE 0 END AS ev
      FROM base
    ),
    hist AS (
      SELECT obs AS t,
             COUNT(CASE WHEN grp = 1 THEN 1 END) AS c1,
             COUNT(CASE WHEN grp = 2 THEN 1 END) AS c2,
             CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN grp = 2 THEN ev ELSE 0 END) AS BIGINT) AS d2
      FROM subj GROUP BY obs
    ),
    risk AS (
      SELECT t, d1, d2,
             CAST(SUM(c1) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
             CAST(SUM(c1 + c2) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
      FROM hist
    ),
    terms AS (
      SELECT t, d1,
             CAST((d1 + d2) * n1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1,
             CAST((d1 + d2) * n1 AS DOUBLE) / CAST(n AS DOUBLE)
               * (CAST(n - n1 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n - d1 - d2 AS DOUBLE) / CAST(n - 1 AS DOUBLE)) AS v
      FROM risk WHERE d1 + d2 > 0 AND n > 1
    ),
    folded AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             list_reduce(list(e1 ORDER BY t), (a, b) -> a + b) AS se1,
             list_reduce(list(v ORDER BY t), (a, b) -> a + b) AS sv,
             COUNT(*) AS n_times
      FROM terms
    )
    SELECT o1, se1 AS e1, n_times,
           (CAST(o1 AS DOUBLE) - se1) * (CAST(o1 AS DOUBLE) - se1) / sv
             AS chi2
    FROM folded
    """,
    tags=("relational", "finance", "survival"),
)
def q357_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK TEST — the significance half of the survival family
    (q304's Kaplan-Meier curves answer "what does survival look
    like"; this answers "do the two arms DIFFER"): urgent-priority vs
    other orders, time to first shipment, right-censored at the q304
    observation window. χ² = (O₁−E₁)²/V with the hypergeometric
    per-death-time terms E₁ₜ = dₜ·n₁ₜ/nₜ and
    Vₜ = dₜ·n₁ₜ·(nₜ−n₁ₜ)·(nₜ−dₜ) / (nₜ²·(nₜ−1)).

    Cross-engine exactness device: every per-time term is a pinned
    left-associated chain of IEEE divisions/products of exact 64-bit
    integers — V is STAGED as (d·n₁/n)·((n−n₁)/n)·((n−d)/(n−1)) so no
    intermediate integer product can overflow at ANY row count (the
    single 4-factor numerator would pass 2⁶³ near 150k subjects) —
    and the sums over death times
    run as PINNED-ORDER folds over time-sorted lists (Spark
    ``aggregate``/``array_sort``, DuckDB ordered ``list_reduce``) —
    no float is ever hash-aggregated. At-risk counts come from one
    DESCENDING cumulative window over the per-day histogram, so the
    whole statistic is two hash aggs + windows over ≤ a few hundred
    day values regardless of row count."""
    W_END = "1998-06-01"
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .filter(F.col("o_orderdate") < F.lit(W_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    base = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(2)
            .alias("grp"),
            F.datediff("first_ship", "o_orderdate").alias("dur"),
            F.datediff(
                F.lit(W_END).cast("timestamp"), F.col("o_orderdate")
            ).alias("cens"),
        )
    )
    subj = base.select(
        "grp",
        F.least("dur", "cens").alias("obs"),
        F.when(F.col("dur") <= F.col("cens"), 1).otherwise(0).alias("ev"),
    )
    hist = subj.groupBy(F.col("obs").alias("t")).agg(
        F.count(F.when(F.col("grp") == 1, 1)).alias("c1"),
        F.count(F.when(F.col("grp") == 2, 1)).alias("c2"),
        F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("grp") == 2, F.col("ev")).otherwise(0))
        .cast("long")
        .alias("d2"),
    )
    wdesc = (
        W.orderBy(F.col("t").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = hist.select(
        "t",
        "d1",
        "d2",
        F.sum("c1").over(wdesc).cast("long").alias("n1"),
        F.sum(F.col("c1") + F.col("c2")).over(wdesc).cast("long").alias("n"),
    )
    d = F.col("d1") + F.col("d2")
    terms = risk.filter((d > 0) & (F.col("n") > 1)).select(
        "t",
        "d1",
        (
            (d * F.col("n1")).cast("double") / F.col("n").cast("double")
        ).alias("e1"),
        (
            (d * F.col("n1")).cast("double")
            / F.col("n").cast("double")
            * (
                (F.col("n") - F.col("n1")).cast("double")
                / F.col("n").cast("double")
            )
            * (
                (F.col("n") - d).cast("double")
                / (F.col("n") - 1).cast("double")
            )
        ).alias("v"),
    )
    fold = (
        "aggregate(transform(array_sort(collect), s -> s.x),"
        " CAST(0.0D AS DOUBLE), (acc, x) -> acc + x)"
    )
    folded = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.expr(
            fold.replace("collect", "collect_list(struct(t, e1 AS x))")
        ).alias("se1"),
        F.expr(
            fold.replace("collect", "collect_list(struct(t, v AS x))")
        ).alias("sv"),
        F.count(F.lit(1)).alias("n_times"),
    )
    o1d = F.col("o1").cast("double")
    return folded.select(
        "o1",
        F.col("se1").alias("e1"),
        "n_times",
        ((o1d - F.col("se1")) * (o1d - F.col("se1")) / F.col("sv")).alias("chi2"),
    )


@query(
    "q358_kruskal_wallis",
    oracle="""
    WITH s AS (SELECT event_type AS g, value AS v FROM events),
    r AS (
      SELECT g,
             RANK() OVER (ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY v) AS tcnt
      FROM s
    ),
    pg AS (
      SELECT g, COUNT(*) AS n,
             CAST(SUM(2 * rk + tcnt - 1) AS BIGINT) AS r2
      FROM r GROUP BY g
    ),
    nn AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM pg),
    ties AS (
      SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS tsum
      FROM (SELECT COUNT(*) AS c FROM s GROUP BY v)
    ),
    terms AS (
      SELECT g,
             (CAST(r2 AS DOUBLE) / 2.0) * (CAST(r2 AS DOUBLE) / 2.0)
               / CAST(n AS DOUBLE) AS term
      FROM pg
    ),
    folded AS (
      SELECT list_reduce(list(term ORDER BY g), (a, b) -> a + b) AS s_terms,
             COUNT(*) AS k_groups
      FROM terms
    )
    SELECT k_groups, n_total,
           (12.0 / CAST(n_total * (n_total + 1) AS DOUBLE) * s_terms
              - 3.0 * CAST(n_total + 1 AS DOUBLE))
             / (1.0 - CAST(tsum AS DOUBLE)
                  / CAST(n_total * n_total * n_total - n_total AS DOUBLE))
             AS h_statistic
    FROM folded, nn, ties
    """,
    tags=("relational", "abtest", "stats"),
)
def q358_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H — the k-sample extension of q355's
    Mann-Whitney (one-way ANOVA on ranks): do the five event types
    draw values from the same distribution?
    H = [12/(N(N+1))]·Σᵢ R̄ᵢ²·nᵢ⁻¹·4⁻¹·(2R̄ᵢ)² … computed as
    Σ (r2ᵢ/2)²/nᵢ with the SAME integer midrank device as q355
    (2·midrank = 2·rank + t − 1, so every aggregation is exact
    64-bit), tie-corrected by 1 − Σ(t³−t)/(N³−N). The k per-group
    terms fold in group-name order (pinned-order sum — q356's
    device); the statistic itself is a scalar chain of
    correctly-rounded IEEE ops. One global ranking window (one
    combined sample by construction); everything after runs on k
    rows."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), F.col("value").alias("v")
    )
    r = ev.select(
        "g",
        F.rank().over(W.orderBy("v")).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("v")).alias("tcnt"),
    )
    pg = r.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(2 * F.col("rk") + F.col("tcnt") - 1).cast("long").alias("r2"),
    )
    ties = (
        ev.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
            .cast("long")
            .alias("tsum")
        )
    )
    half = F.col("r2").cast("double") / F.lit(2.0)
    terms = pg.select(
        "g", "n", (half * half / F.col("n").cast("double")).alias("term")
    )
    folded = terms.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(g, term AS x))),"
            " s -> s.x), CAST(0.0D AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("s_terms"),
        F.count(F.lit(1)).alias("k_groups"),
    ).crossJoin(ties)
    nt = F.col("n_total")
    h = (
        F.lit(12.0) / (nt * (nt + 1)).cast("double") * F.col("s_terms")
        - F.lit(3.0) * (nt + 1).cast("double")
    )
    corr = F.lit(1.0) - F.col("tsum").cast("double") / (
        nt * nt * nt - nt
    ).cast("double")
    return folded.select(
        "k_groups", "n_total", (h / corr).alias("h_statistic")
    )


@query(
    "q361_jarque_bera",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38, 6))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n,
             round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                   / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS s,
             round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                   / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS k
      FROM sums
    )
    SELECT l_returnflag, n,
           round(CAST(n AS DOUBLE) / 6.0 * (s * s + k * k / 4.0), 4) AS jb,
           CAST(n AS DOUBLE) / 6.0 * (s * s + k * k / 4.0) > 5.991 AS non_normal
    FROM m ORDER BY l_returnflag
    """,
    tags=("aggregation", "statistics"),
)
def q361_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA normality test per return-flag class:
    JB = n/6·(S² + K²/4) against χ²(2) — the moment-based normality
    screen risk models run before assuming Gaussian P&L (here it
    correctly flags the uniform-ish quantity distribution as
    non-normal via its platykurtic K≈−1.2). Built ENTIRELY on q98's
    exact-DECIMAL moment machinery: the four power sums are
    order-insensitive decimals, skew/kurt evaluate identically on
    both engines and are pinned at 6 decimals (absorbing the one libm
    pow call — the q98 device), so JB is plain IEEE arithmetic on
    identical inputs. One hash agg, five result rows."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec(x, 6)).cast("double").alias("s1"),
        F.sum((x * x).cast("decimal(38,6)")).cast("double").alias("s2"),
        F.sum((x * x * x).cast("decimal(38,6)")).cast("double").alias("s3"),
        F.sum((x * x * x * x).cast("decimal(38,6)")).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    s = F.round(
        (s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu) / F.pow(m2, F.lit(1.5)),
        6,
    )
    k = F.round(
        (s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu)
        / F.pow(m2, F.lit(2.0))
        - 3,
        6,
    )
    m = sums.select("l_returnflag", "n", s.alias("s"), k.alias("k"))
    jb = (
        F.col("n").cast("double")
        / F.lit(6.0)
        * (F.col("s") * F.col("s") + F.col("k") * F.col("k") / F.lit(4.0))
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(jb, 4).alias("jb"),
        (jb > F.lit(5.991)).alias("non_normal"),
    ).orderBy("l_returnflag")


@query(
    "q362_herfindahl_index",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment,
             n_nationkey AS nation,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY c_mktsegment, n_nationkey
    ),
    tot AS (
      SELECT c_mktsegment, nation,
             CAST(rev_dec AS DOUBLE) AS rev,
             CAST(SUM(rev_dec) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
               AS seg_rev
      FROM seg
    ),
    terms AS (
      SELECT c_mktsegment,
             (rev / seg_rev) * (rev / seg_rev) AS sq
      FROM tot
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_nations,
           list_reduce(list(sq ORDER BY sq, c_mktsegment), (a, b) -> a + b) AS hhi
    FROM terms GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("relational", "finance", "concentration"),
)
def q362_herfindahl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN concentration index per market segment —
    HHI = Σ shareᵢ² over the nations serving the segment (the
    counterparty/portfolio concentration measure beside q251's Gini):
    near 1/n = diversified, near 1 = concentrated. Shares come from
    DECIMAL-exact revenue sums (window total per segment), each share
    is one IEEE division, its square one multiplication, and the ≤25
    per-segment terms fold in PINNED ORDER (sorted by the share value
    itself — identical on both engines because the doubles are
    identical). One join-agg over the data, then everything on the
    |segments|×|nations| grid.

    The segment-total window sums DECIMAL values (exact,
    order-insensitive) before the final double cast — no float is
    ever hash-aggregated."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", F.col("n_nationkey").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
        )
    )
    wseg = W.partitionBy("c_mktsegment")
    share = F.col("rev_dec").cast("double") / F.sum("rev_dec").over(wseg).cast(
        "double"
    )
    terms = seg.select("c_mktsegment", (share * share).alias("sq"))
    return (
        terms.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(sq, c_mktsegment))),"
                " s -> s.sq), CAST(0.0D AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("hhi"),
        )
        .orderBy("c_mktsegment")
    )


#: Benford expected first-digit probabilities log10(1+1/d), d=1..9 —
#: PINNED literals (no runtime libm), shared by the query and oracle.
BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}


@query(
    "q363_benford_first_digit",
    oracle="""
    WITH p(digit, exp_p) AS (VALUES
      (1, 0.3010299956639812e0), (2, 0.17609125905568124e0),
      (3, 0.12493873660829992e0), (4, 0.09691001300805642e0),
      (5, 0.07918124604762482e0), (6, 0.06694678963061322e0),
      (7, 0.05799194697768673e0), (8, 0.05115252244738129e0),
      (9, 0.04575749056067514e0)
    ),
    d AS (
      SELECT CAST(SUBSTRING(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders
    ),
    o AS (
      SELECT digit, COUNT(*) AS n_d FROM d GROUP BY digit
    ),
    j AS (
      SELECT p.digit, COALESCE(n_d, 0) AS n_d, exp_p,
             CAST(SUM(COALESCE(n_d, 0)) OVER () AS DOUBLE) AS n
      FROM p LEFT JOIN o ON p.digit = o.digit
    ),
    t AS (
      SELECT digit, n_d, exp_p,
             (CAST(n_d AS DOUBLE) - n * exp_p) * (CAST(n_d AS DOUBLE) - n * exp_p)
               / (n * exp_p) AS term
      FROM j
    ),
    f AS (
      SELECT list_reduce(list(term ORDER BY digit), (a, b) -> a + b) AS chi2
      FROM t
    )
    SELECT digit, CAST(n_d AS BIGINT) AS n_d, exp_p, chi2
    FROM t, f ORDER BY digit
    """,
    tags=("relational", "finance", "fraud"),
)
def q363_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit screen over order values — the
    classic forensic-accounting fraud test (fabricated amounts flunk
    the log-law): per leading digit d the observed count vs the
    expected n·log₁₀(1+1/d), with the χ²(8) goodness-of-fit statistic.

    Exactness devices: the first digit comes from the DECIMAL(18,2)
    string rendering (no float formatting ambiguity); the nine
    expected probabilities are PINNED LITERALS (no runtime libm
    log10); each χ² term is per-row IEEE arithmetic in pinned order;
    and the 9-term sum folds in digit order on both engines (Spark
    aggregate over the full 1–9 grid — digits absent from the data
    contribute (0 − n·p)²/(n·p), which is why the expected table LEFT
    JOINs the observed counts, never the reverse). One hash agg over
    the data; everything after runs on nine rows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    obs = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    p = spark.createDataFrame(
        [(d, BENFORD_P[d]) for d in range(1, 10)], "digit LONG, exp_p DOUBLE"
    )
    j = p.join(obs, "digit", "left").select(
        "digit",
        F.coalesce("n_d", F.lit(0)).cast("long").alias("n_d"),
        "exp_p",
    )
    j = j.withColumn(
        "n", F.sum("n_d").over(W.partitionBy()).cast("double")
    ).withColumn(
        "term",
        (F.col("n_d").cast("double") - F.col("n") * F.col("exp_p"))
        * (F.col("n_d").cast("double") - F.col("n") * F.col("exp_p"))
        / (F.col("n") * F.col("exp_p")),
    )
    chi2 = F.expr(
        "aggregate(transform(array_sort(collect_list(struct(digit, term))),"
        " s -> s.term), CAST(0.0D AS DOUBLE), (acc, x) -> acc + x)"
    )
    folded = j.agg(chi2.alias("chi2"))
    return (
        j.crossJoin(F.broadcast(folded))
        .select("digit", "n_d", "exp_p", "chi2")
        .orderBy("digit")
    )


@query(
    "q364_pareto_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    cum AS (
      SELECT l_partkey, r,
             CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(SUM(r) OVER () AS DOUBLE) AS cum_share
      FROM rev
    ),
    cls AS (
      SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             l_partkey, r
      FROM cum
    )
    SELECT abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(r) AS DOUBLE) AS class_revenue
    FROM cls GROUP BY abc_class ORDER BY abc_class
    """,
    tags=("relational", "finance", "pareto"),
)
def q364_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO / ABC classification of parts by revenue — the 80/15/5
    inventory-and-exposure split (A: the head covering 80% of
    cumulative revenue, B: to 95%, C: the tail): a handful of A-class
    keys dominating revenue is also exactly the skew profile that
    motivates q89's salted join. Exactness devices: per-part revenue
    and BOTH window sums (running and total) stay in DECIMAL —
    order-insensitive under any partial aggregation — with one IEEE
    division per row for the cumulative share; the descending order
    pins the unique l_partkey as tiebreak so equal-revenue parts
    classify identically on both engines. One shuffle on the part
    key, one ranking window, three output rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_extendedprice").cast("decimal(18,2)").alias("p")
    )
    rev = li.groupBy("l_partkey").agg(F.sum("p").alias("r"))
    wcum = (
        W.orderBy(F.col("r").desc(), "l_partkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = rev.select(
        "l_partkey",
        "r",
        (
            F.sum("r").over(wcum).cast("double")
            / F.sum("r").over(W.partitionBy()).cast("double")
        ).alias("cum_share"),
    )
    cls = cum.select(
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "r",
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@query(
    "q376_gap_fill_interpolate",
    oracle="""
    WITH obs AS (
      SELECT user_id, DATE_TRUNC('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS v_obs
      FROM events WHERE user_id % 15 = 0
      GROUP BY user_id, DATE_TRUNC('hour', ts)
    ),
    b AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY user_id),
    spine AS (
      SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b
    ),
    j AS (
      SELECT s.user_id, s.h, o.v_obs
      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h
    ),
    wnd AS (
      SELECT user_id, h, v_obs,
        last_value(v_obs IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_v,
        last_value(CASE WHEN v_obs IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_h,
        first_value(v_obs IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_v,
        first_value(CASE WHEN v_obs IS NOT NULL THEN h END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_h
      FROM j
    )
    SELECT user_id,
           STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           (v_obs IS NOT NULL) AS is_observed,
           CASE WHEN v_obs IS NOT NULL THEN v_obs
                WHEN p_v IS NULL THEN n_v
                WHEN n_v IS NULL THEN p_v
                ELSE (p_v + ((n_v - p_v)
                      * (CAST(epoch(h) - epoch(p_h) AS DOUBLE)
                         / CAST(epoch(n_h) - epoch(p_h) AS DOUBLE))))
           END AS v_filled
    FROM wnd ORDER BY user_id, h
    """,
    tags=("events", "timeseries", "window"),
)
def q376_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP FILL + linear interpolation — the resampling
    primitive (TimescaleDB's time_bucket_gapfill / interpolate) every
    event lakehouse needs before joining irregular series: per user,
    a dense hourly spine spans [first, last] observation
    (``sequence()`` + explode — generated, never shuffled), missing
    hours take the linear interpolation between the bracketing
    observations (two IGNORE NULLS window passes locate them; edges
    carry the nearest value). Interpolation arithmetic is the same
    IEEE tree on both engines (integer epoch deltas, one division),
    and observed hours pass their exact DECIMAL-summed value through —
    hash-exact end to end.

    Scale shape (r14 segment form): ONE scan + hour aggregate, one
    lead() window locates each observation's successor, and the dense
    spine is generated per SEGMENT [h, next_h) — explode stays
    map-side, the spine⨝obs hash join and the bounds aggregate (a
    second full scan+agg subtree in the old plan) are gone entirely.
    Exact because v_obs is never NULL (dsum over non-null values), so
    the previous/next non-null observations the two IGNORE NULLS
    window passes located are precisely the segment endpoints; the
    interpolation expression is the same IEEE tree (integer epoch
    deltas, one double division), hash-exact end to end."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 15 == 0)
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(dsum("value").alias("v_obs"))
    w = W.partitionBy("user_id").orderBy("h")
    seg = obs.select(
        "user_id",
        "h",
        "v_obs",
        F.lead("h").over(w).alias("n_h"),
        F.lead("v_obs").over(w).alias("n_v"),
    )
    hours = seg.select(
        "user_id",
        "h",
        "v_obs",
        "n_h",
        "n_v",
        F.explode(
            F.sequence(
                F.col("h"),
                F.coalesce(F.col("n_h") - F.expr("INTERVAL 1 HOUR"), F.col("h")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hh"),
    )
    eh, ph, nh = (F.unix_timestamp(c) for c in ("hh", "h", "n_h"))
    frac = (eh - ph).cast("double") / (nh - ph).cast("double")
    is_obs = F.col("hh") == F.col("h")
    filled = F.when(is_obs, F.col("v_obs")).otherwise(
        F.col("v_obs") + ((F.col("n_v") - F.col("v_obs")) * frac)
    )
    return hours.select(
        "user_id",
        F.date_format("hh", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        is_obs.alias("is_observed"),
        filled.alias("v_filled"),
    ).orderBy("user_id", "hh")


def _q377_oracle() -> str:
    """DuckDB twin of q377 — the same blocked candidates, agreement
    predicates, and det_ln_ratio-folded Fellegi-Sunter weights in the
    same left-fold summation order."""
    from ent_fins_lakehouse_spark.operators.linkage import field_weights_sql

    wa1, wd1 = field_weights_sql((9, 10), (1, 20))  # acctbal last digit
    wa2, wd2 = field_weights_sql((4, 5), (1, 50))  # acctbal proximity
    wa3, wd3 = field_weights_sql((17, 20), (1, 100))  # entity number mod
    score = (
        f"((CASE WHEN agree_digit THEN {wa1} ELSE {wd1} END"
        f" + CASE WHEN agree_acct THEN {wa2} ELSE {wd2} END)"
        f" + CASE WHEN agree_num THEN {wa3} ELSE {wd3} END)"
    )
    return f"""
    WITH cand AS (
      SELECT c.c_custkey, s.s_suppkey,
             (CAST(FLOOR(abs(c.c_acctbal)) AS BIGINT) % 10
              = CAST(FLOOR(abs(s.s_acctbal)) AS BIGINT) % 10) AS agree_digit,
             (abs(c.c_acctbal - s.s_acctbal) < 100.0) AS agree_acct,
             (CAST(regexp_extract(c.c_name, '([0-9]+)$', 1) AS BIGINT) % 100
              = CAST(regexp_extract(s.s_name, '([0-9]+)$', 1) AS BIGINT) % 100) AS agree_num
      FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
    )
    SELECT c_custkey, s_suppkey,
           (CAST(agree_digit AS INTEGER) + CAST(agree_acct AS INTEGER)
            + CAST(agree_num AS INTEGER)) AS n_agree,
           {score} AS fs_score
    FROM cand
    WHERE {score} > 0.0
    ORDER BY fs_score DESC, c_custkey, s_suppkey LIMIT 200
    """


@query("q377_record_linkage", oracle=_q377_oracle(), tags=("linkage", "entity-resolution"))
def q377_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi-Sunter 1969) between the
    customer and supplier files — see operators/linkage.py: blocked
    candidates (nation equi-join — the bounded-blocking discipline,
    never a cross join), three comparison fields (balance last-digit,
    account-balance proximity, entity-number congruence), each
    contributing its log-likelihood-ratio weight computed from
    rational m/u probabilities via det_ln_ratio — so scores are
    bit-identical to the SQL oracle. Pairs above the ln-odds-0
    threshold rank by score (TakeOrderedAndProject)."""
    from ent_fins_lakehouse_spark.operators.linkage import (
        FieldSpec,
        fellegi_sunter_score,
        linkage_candidates,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nk"), "c_acctbal", "c_name"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("nk"), "s_acctbal", "s_name"
    )
    cand = linkage_candidates(cust, supp, ["nk"]).select(
        "c_custkey",
        "s_suppkey",
        (
            F.floor(F.abs(F.col("c_acctbal"))).cast("bigint") % 10
            == F.floor(F.abs(F.col("s_acctbal"))).cast("bigint") % 10
        ).alias("agree_digit"),
        (F.abs(F.col("c_acctbal") - F.col("s_acctbal")) < F.lit(100.0)).alias(
            "agree_acct"
        ),
        (
            F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("bigint") % 100
            == F.regexp_extract("s_name", r"([0-9]+)$", 1).cast("bigint") % 100
        ).alias("agree_num"),
    )
    fields = [
        FieldSpec("digit", F.col("agree_digit"), (9, 10), (1, 20)),
        FieldSpec("acct", F.col("agree_acct"), (4, 5), (1, 50)),
        FieldSpec("num", F.col("agree_num"), (17, 20), (1, 100)),
    ]
    score = fellegi_sunter_score(fields)
    n_agree = (
        F.col("agree_digit").cast("int")
        + F.col("agree_acct").cast("int")
        + F.col("agree_num").cast("int")
    )
    return (
        cand.select(
            "c_custkey",
            "s_suppkey",
            n_agree.alias("n_agree"),
            score.alias("fs_score"),
        )
        .filter(F.col("fs_score") > 0.0)
        .orderBy(F.desc("fs_score"), "c_custkey", "s_suppkey")
        .limit(200)
    )


@query(
    "q379_session_pattern_match",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, substring(event_type, 1, 1) AS c FROM events
    ),
    g AS (
      SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM g
    ),
    q AS (
      SELECT user_id, sid, string_agg(c, '' ORDER BY ts, event_id) AS seq
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           COUNT(*) FILTER (WHERE regexp_matches(seq, 'vc+p')) AS n_vcp_sessions,
           CAST(MAX(length(seq)) AS BIGINT) AS longest_session
    FROM q GROUP BY user_id ORDER BY user_id
    """,
    tags=("events", "sessionization", "pattern"),
)
def q379_session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over sessions — the MATCH_RECOGNIZE shape
    (SQL:2016) Spark lacks natively, expressed as sessionize → encode
    each session's ordered event-type sequence as a string → regex:
    here 'view, one-or-more clicks, purchase' occurring CONTIGUOUSLY
    inside a 30-minute-gap session ('vc+p' over first letters, which
    are unique across the five event types). Per user: sessions,
    pattern-matching sessions, longest session.

    Scale shape: one user-hash exchange feeds the lag window, the
    running-sum session ids, and the per-session aggregation; the
    regex runs once per SESSION (not per event) in codegen. Ordering
    ties break on event_id, so the encoded sequence — and the hash —
    is deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    brk = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), F.lit(1)).otherwise(F.lit(0))
    sid = F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long")
    sessions = (
        ev.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "c"))),
                    lambda x: x["c"],
                ),
                "",
            ).alias("seq")
        )
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count_if(F.col("seq").rlike("vc+p")).alias("n_vcp_sessions"),
            F.max(F.length("seq")).cast("long").alias("longest_session"),
        )
        .orderBy("user_id")
    )
