"""ML dataflow queries (SURVEY.md §2.11).

The reference's task shape (`/root/reference/Instructor/03-Fraud-ML.py`):
binary label derived from business columns, categorical + numeric
features, temporal train/valid split (`:95-96`), CV-fitted logistic
regression, scored DataFrame, business-value confusion matrix (`:231`).
Re-expressed over the driver's tables: predict urgent orders from
customer segment / nation / account balance / order totals.

Oracle policy: the deterministic feature-engineering projection gets a
DuckDB oracle (including the frequency-ordered StringIndexer contract,
reproduced in SQL with a window rank). Model TRAINING is seed- and
partitioning-sensitive (LBFGS/IRLS float accumulation order), so the
train/score queries put their hard signal in a FROZEN SCORING HEAD
(VERDICT r12 item 4, the q141/q285 fold-to-boolean pattern): literal
coefficients + threshold pinned from one real LogisticRegression fit
(see ``_FROZEN_*`` below) score the held-out years through ONE
canonical SQL expression both engines parse — margin comparison
``z >= t`` instead of a sigmoid, so no transcendental drift — giving
deterministic integer confusion counts the DuckDB oracle restates.
The LIVE training still runs in-plan; its health folds into literal
booleans (AUC band on a noise label, probability sanity, GLM-vs-frozen
agreement) that the oracle asserts as TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ent_fins_lakehouse_spark.plans.registry import query
from ent_fins_lakehouse_spark.sources.readers import load_table

CAT_COLS = ["c_mktsegment", "n_name"]
NUM_COLS = ["c_acctbal", "o_totalprice", "order_year"]

#: Frozen scoring head — ONE real LogisticRegression fit (maxIter=50,
#: regParam=0.01, sf0.01 train years <= 1997) on segment one-hots +
#: scaled numerics, coefficients rounded to 8 decimals and pinned.
#: The threshold is the fitted model's median validation margin, so
#: predictions split ~50/50 and the confusion matrix exercises all
#: four cells. The head is a deterministic linear scorer both engines
#: evaluate from the SAME expression string; training quality on this
#: label is irrelevant to the hash (o_orderpriority is uniform noise
#: in TPC-H — the live fit's AUC ~0.5 by construction, asserted as a
#: band boolean, not a floor).
_FROZEN_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_FROZEN_SEG_W = [0.0423981, -0.06126651, -0.06526295, -0.02465735, 0.10681643]
_FROZEN_ACCT_W = 0.09472914
_FROZEN_TOTAL_W = 0.03815956
_FROZEN_YEAR_W = 0.01645821
_FROZEN_INTERCEPT = -0.54544586
_FROZEN_THRESHOLD = -0.33965511


def _lit(x: float) -> str:
    """A float literal BOTH engines parse as DOUBLE: e-notation (DuckDB
    parses plain ``0.04`` as DECIMAL, whose arithmetic differs)."""
    return f"{x:.8e}"


def frozen_z_sql() -> str:
    """The canonical margin expression, shared verbatim by the Spark
    plan (``F.expr``) and the DuckDB oracle — identical parse, identical
    left-associative double arithmetic, so the scored margin is
    bit-equal cross-engine. Expects columns ``c_mktsegment`` (string)
    and ``c_acctbal``/``o_totalprice``/``order_year`` (double)."""
    terms = [
        f"({_lit(w)}) * (CASE WHEN c_mktsegment = '{s}' THEN 1.0 ELSE 0.0 END)"
        for s, w in zip(_FROZEN_SEGS, _FROZEN_SEG_W)
    ]
    terms.append(f"({_lit(_FROZEN_ACCT_W)}) * (c_acctbal / 10000.0)")
    terms.append(f"({_lit(_FROZEN_TOTAL_W)}) * (o_totalprice / 100000.0)")
    terms.append(f"({_lit(_FROZEN_YEAR_W)}) * (order_year - 1995.0)")
    terms.append(f"({_lit(_FROZEN_INTERCEPT)})")
    return " + ".join(terms)


def frozen_pred_sql() -> str:
    """Frozen prediction: margin >= threshold (no sigmoid — the
    monotone transform can't change the comparison, and exp() is the
    one place engines could drift in the last bit)."""
    return (
        f"CASE WHEN ({frozen_z_sql()}) >= ({_lit(_FROZEN_THRESHOLD)}) "
        "THEN 1 ELSE 0 END"
    )


#: the q70 feature derivation as a DuckDB CTE body, restricted to the
#: held-out years — every frozen-head oracle scores over this
_ORACLE_VALID_CTE = """
    WITH v AS (
        SELECT c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(EXTRACT(year FROM o_orderdate) AS DOUBLE) AS order_year,
               CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS INT) AS label_i
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE EXTRACT(year FROM o_orderdate) > 1997
    )
"""


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


@query(
    "q72_ml_train_score",
    oracle=_ORACLE_VALID_CTE
    + f"""
    SELECT label_i,
           {frozen_pred_sql()} AS pred_i,
           COUNT(*) AS n,
           TRUE AS trained_auc_band_ok,
           TRUE AS trained_proba_ok
    FROM v GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("ml",),
)
def q72_ml_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M10: temporal split (reference `03-Fraud-ML.py:95-96`),
    pipeline fit on the early years, score the late years. Hard signal
    (VERDICT r12 item 4): the payload is the frozen head's integer
    confusion counts over the held-out years — deterministic
    cross-engine — while the LIVE LogisticRegression fit folds into two
    literal booleans: AUC inside the noise band (the label is uniform
    o_orderpriority — a calibrated model sits near 0.5; outside
    [0.30, 0.70] means the pipeline broke) and scored probabilities
    sane (within [0,1] and non-constant)."""
    from ent_fins_lakehouse_spark.ml.pipeline import auc, score, train_lr

    ds = ml_dataset(spark, sf_dir)
    train = ds.filter(F.col("order_year") <= 1997).cache()
    valid = ds.filter(F.col("order_year") > 1997).cache()
    model = train_lr(train, CAT_COLS, NUM_COLS)
    scored = score(model, valid, id_cols=["o_orderkey"])
    a = auc(scored)
    pr = scored.agg(
        F.min("p1").alias("lo"),
        F.max("p1").alias("hi"),
        F.avg("p1").alias("mean_p"),
        F.avg("label").alias("base_rate"),
    ).first()
    auc_ok = bool(0.30 <= a <= 0.70)
    # probabilities in range AND calibrated to the label prior. NOT a
    # min<max spread check: at larger SFs the regularized fit correctly
    # collapses to the intercept on this noise label (constant p =
    # prior) — a constant, calibrated model is healthy here. Band 0.10:
    # at sf0.001 the ~1.6k-row fit drifts ~0.06 off the held-out prior
    # (small-sample overfit + split-prior noise); a broken pipeline
    # (all-0/all-1 scores, label leak) lands far outside either way
    proba_ok = bool(
        0.0 <= pr["lo"] <= pr["hi"] <= 1.0
        and abs(pr["mean_p"] - pr["base_rate"]) <= 0.10
    )
    return (
        valid.select(
            F.col("label").cast("int").alias("label_i"),
            F.expr(frozen_pred_sql()).alias("pred_i"),
        )
        .groupBy("label_i", "pred_i")
        .agg(F.count("*").alias("n"))
        .select(
            "label_i",
            "pred_i",
            "n",
            F.lit(auc_ok).alias("trained_auc_band_ok"),
            F.lit(proba_ok).alias("trained_proba_ok"),
        )
        .orderBy("label_i", "pred_i")
    )


@query(
    "q73_ml_confusion_net",
    oracle=_ORACLE_VALID_CTE
    + f"""
    SELECT label_i,
           {frozen_pred_sql()} AS pred_i,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_net
    FROM v GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("ml",),
)
def q73_ml_confusion_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/M-series: business-value confusion matrix —
    groupBy(label, prediction).agg(count, sum(net))
    (cf. `03-Fraud-ML.py:231`; net = order value at stake). Scored by
    the frozen head so the matrix is deterministic and hash-checked;
    the net sums ride the DECIMAL discipline (q140) on both engines.
    The train-and-score path itself is q72/q365's job."""
    from ent_fins_lakehouse_spark.ml.pipeline import confusion_net

    valid = ml_dataset(spark, sf_dir).filter(F.col("order_year") > 1997)
    scored = valid.select(
        F.col("label").cast("int").alias("label_i"),
        F.expr(frozen_pred_sql()).alias("pred_i"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("net"),
    )
    return confusion_net(
        scored, net_col="net", label_col="label_i", pred_col="pred_i"
    ).select(
        "label_i",
        "pred_i",
        "n",
        F.col("sum_net").cast("double").alias("sum_net"),
    )


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


@query(
    "q365_ml_glm_train_score",
    oracle=_ORACLE_VALID_CTE
    + f"""
    SELECT label_i,
           {frozen_pred_sql()} AS pred_i,
           COUNT(*) AS n,
           CAST(SUM(CAST(({frozen_z_sql()}) AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_margin,
           TRUE AS glm_auc_band_ok,
           TRUE AS glm_tracks_frozen_ok
    FROM v GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("ml",),
)
def q365_ml_glm_train_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's nominal estimator, fitted for real: its MLflow
    run is named "glm" (`03-Fraud-ML.py:207`) though the code fits
    LogisticRegression — q365 trains the GeneralizedLinearRegression
    twin (binomial family, logit link: the same model by IRLS) on the
    q72 temporal split and scores the held-out years. Hard signal: the
    frozen head's confusion counts PLUS the per-cell margin sums (each
    margin rounded to DECIMAL(18,6) before summing — exact decimal
    addition, so partition order can't drift the hash). The live IRLS
    fit folds into literal booleans: AUC in the noise band, and mean
    |p_glm − sigmoid(frozen z)| <= 0.15 — the LR/GLM-agreement check
    (same model family on the same features must produce nearby
    probabilities even on a noise label)."""
    from ent_fins_lakehouse_spark.ml.pipeline import (
        _strip_training_summaries,
        auc,
        train_glm,
    )

    ds = ml_dataset(spark, sf_dir)
    train = ds.filter(F.col("order_year") <= 1997).cache()
    valid = ds.filter(F.col("order_year") > 1997).cache()
    model = train_glm(train, CAT_COLS, NUM_COLS)
    _strip_training_summaries(model)
    scored = model.transform(valid).select(
        "label",
        F.col("prediction").alias("p1"),
        F.expr(frozen_z_sql()).alias("_z"),
    )
    a = auc(scored)
    gap = scored.agg(
        F.avg(F.abs(F.col("p1") - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z")))))
        .alias("g")
    ).first()["g"]
    auc_ok = bool(0.30 <= a <= 0.70)
    tracks_ok = bool(gap is not None and gap <= 0.15)
    return (
        valid.select(
            F.col("label").cast("int").alias("label_i"),
            F.expr(frozen_pred_sql()).alias("pred_i"),
            F.expr(frozen_z_sql()).cast("decimal(18,6)").alias("_m"),
        )
        .groupBy("label_i", "pred_i")
        .agg(
            F.count("*").alias("n"),
            F.sum("_m").cast("double").alias("sum_margin"),
        )
        .select(
            "label_i",
            "pred_i",
            "n",
            "sum_margin",
            F.lit(auc_ok).alias("glm_auc_band_ok"),
            F.lit(tracks_ok).alias("glm_tracks_frozen_ok"),
        )
        .orderBy("label_i", "pred_i")
    )
