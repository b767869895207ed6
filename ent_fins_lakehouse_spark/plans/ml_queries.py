"""ML dataflow queries (SURVEY.md §2.11).

The reference's task shape (`/root/reference/Instructor/03-Fraud-ML.py`):
binary label derived from business columns, categorical + numeric
features, temporal train/valid split (`:95-96`), CV-fitted logistic
regression, scored DataFrame, business-value confusion matrix (`:231`).
Re-expressed over the driver's tables: predict urgent orders from
customer segment / nation / account balance / order totals.

Oracle policy: the deterministic feature-engineering projection gets a
DuckDB oracle (including the frequency-ordered StringIndexer contract,
reproduced in SQL with a window rank); model fit/score queries are
rows-only — CV selection is seed- and partitioning-sensitive, exactly
the reason SURVEY.md §5 keeps ML out of the hash-matched corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ent_fins_lakehouse_spark.plans.registry import query
from ent_fins_lakehouse_spark.sources.readers import load_table

CAT_COLS = ["c_mktsegment", "n_name"]
NUM_COLS = ["c_acctbal", "o_totalprice", "order_year"]


def ml_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature engineering (P-series over joins): label = urgent-or-
    high priority; features from customer ⋈ nation ⋈ orders. The
    nation/region dims are broadcast — the only shuffle is the
    customer⋈orders equi-join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            "o_orderkey",
            "c_mktsegment",
            "n_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.year("o_orderdate").cast("double").alias("order_year"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("double")
            .alias("label"),
        )
    )


@query(
    "q70_ml_features",
    oracle="""
    SELECT o_orderkey,
           c_mktsegment,
           n_name,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(EXTRACT(year FROM o_orderdate) AS DOUBLE) AS order_year,
           CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS DOUBLE) AS label
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    """,
    tags=("ml",),
)
def q70_ml_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic feature/label projection feeding the pipeline."""
    return ml_dataset(spark, sf_dir)


@query(
    "q71_ml_string_index",
    oracle="""
    WITH freq AS (
        SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment
    ), ranked AS (
        SELECT c_mktsegment,
               ROW_NUMBER() OVER (ORDER BY n DESC, c_mktsegment ASC) - 1 AS seg_idx
        FROM freq
    )
    SELECT c_custkey, c.c_mktsegment, CAST(seg_idx AS DOUBLE) AS seg_idx
    FROM customer c JOIN ranked USING (c_mktsegment)
    """,
    tags=("ml",),
)
def q71_ml_string_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 StringIndexer semantics, oracle-checked: frequency-descending
    (ties broken alphabetically) category → index mapping, the exact
    ``frequencyDesc`` contract of ``StringIndexer``
    (cf. `03-Fraud-ML.py:124`)."""
    from pyspark.ml.feature import StringIndexer

    cust = load_table(spark, sf_dir, "customer")
    model = StringIndexer(
        inputCol="c_mktsegment", outputCol="seg_idx", stringOrderType="frequencyDesc"
    ).fit(cust)
    return model.transform(cust).select("c_custkey", "c_mktsegment", "seg_idx")


@query("q72_ml_train_score", oracle=None, tags=("ml",))
def q72_ml_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M10: temporal split (reference `:95-96`), pipeline fit on the
    early years, score the late years. Rows-only check (CV/LBFGS are
    partitioning-sensitive); AUC floor asserted in tests."""
    from ent_fins_lakehouse_spark.ml.pipeline import score, train_lr

    ds = ml_dataset(spark, sf_dir)
    train = ds.filter(F.col("order_year") <= 1997).cache()
    valid = ds.filter(F.col("order_year") > 1997)
    model = train_lr(train, CAT_COLS, NUM_COLS)
    return score(model, valid, id_cols=["o_orderkey"]).orderBy("o_orderkey")


@query("q73_ml_confusion_net", oracle=None, tags=("ml",))
def q73_ml_confusion_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/M-series: business-value confusion matrix over the scored
    validation set — groupBy(label, prediction).agg(count, sum(net))
    (cf. `03-Fraud-ML.py:231`; net = order value at stake)."""
    from ent_fins_lakehouse_spark.ml.pipeline import confusion_net, score, train_lr

    ds = ml_dataset(spark, sf_dir)
    train = ds.filter(F.col("order_year") <= 1997).cache()
    valid = ds.filter(F.col("order_year") > 1997)
    model = train_lr(train, CAT_COLS, NUM_COLS)
    scored = score(model, valid, id_cols=["o_orderkey"]).join(
        ds.select("o_orderkey", "o_totalprice"), "o_orderkey"
    )
    return confusion_net(scored, net_col="o_totalprice")


@query(
    "q74_feature_table",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           n_orders,
           CAST(total_spend AS DOUBLE) AS total_spend
    FROM customer
    JOIN (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o_custkey
    """,
    tags=("ml", "features"),
)
def q74_feature_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14/U3: keyed feature table via the registry decorator —
    per-customer behavioral aggregates (the borrower-features shape of
    `03-Fraud-ML.py:253-255`)."""
    from ent_fins_lakehouse_spark.functions.numeric import dsum
    from ent_fins_lakehouse_spark.ml.features import FeatureRegistry

    reg = FeatureRegistry()

    @reg.register("customer_features", keys=["c_custkey"], description="spend aggregates")
    def customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        spend = orders.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
        return cust.join(spend, cust["c_custkey"] == spend["o_custkey"]).select(
            "c_custkey",
            "c_mktsegment",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_orders",
            "total_spend",
        )

    return reg.compute("customer_features", spark, sf_dir)


@query("q365_ml_glm_train_score", oracle=None, tags=("ml",))
def q365_ml_glm_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's nominal estimator, fitted for real: its MLflow
    run is named "glm" (`03-Fraud-ML.py:207`) though the code fits
    LogisticRegression — q365 trains the GeneralizedLinearRegression
    twin (binomial family, logit link: the same model by IRLS) on the
    q72 temporal split and scores the held-out years. Rows-only check
    (IRLS is partitioning-sensitive like LBFGS); the AUC floor and
    LR-agreement are asserted in tests/test_ml.py."""
    from ent_fins_lakehouse_spark.ml.pipeline import (
        _strip_training_summaries,
        train_glm,
    )

    ds = ml_dataset(spark, sf_dir)
    train = ds.filter(F.col("order_year") <= 1997).cache()
    valid = ds.filter(F.col("order_year") > 1997)
    model = train_glm(train, CAT_COLS, NUM_COLS)
    _strip_training_summaries(model)
    return (
        model.transform(valid)
        .select(
            "o_orderkey",
            "label",
            F.col("prediction").alias("p1"),
            (F.col("prediction") >= 0.5).cast("double").alias("prediction"),
        )
        .orderBy("o_orderkey")
    )
