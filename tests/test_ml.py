"""ML dataflow tests (SURVEY.md §5.6): pipeline mechanics and AUC
floor on a controlled separable dataset — golden-metric matching is
deliberately avoided (CV/LBFGS are partitioning-sensitive)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def separable(spark):
    """Synthetic learnable data: label = f(segment, balance) + noise-free
    margin, two categorical + one numeric feature."""
    rows = []
    for i in range(600):
        seg = ["AUTO", "HOME", "GOODS"][i % 3]
        nat = ["US", "DE"][i % 2]
        bal = float((i * 37) % 1000)
        # linear margin in (one-hot(seg), bal): separable for LR
        label = 1.0 if bal + (300.0 if seg == "AUTO" else 0.0) > 650.0 else 0.0
        rows.append((i, seg, nat, bal, label))
    return spark.createDataFrame(
        rows, "id LONG, seg STRING, nat STRING, bal DOUBLE, label DOUBLE"
    )


def test_feature_pipeline_shapes(separable):
    from ent_fins_lakehouse_spark.ml.pipeline import build_feature_pipeline

    pipe = build_feature_pipeline(["seg", "nat"], ["bal"])
    out = pipe.fit(separable).transform(separable)
    row = out.select("features").head()
    # per categorical: (n_cats + 1 keep-invalid) indexer slots, minus
    # one for OHE dropLast → seg 3, nat 2; plus 1 numeric
    assert row["features"].size == 3 + 2 + 1


def test_train_score_auc_floor(separable):
    from ent_fins_lakehouse_spark.ml.pipeline import auc, score, train_lr

    model = train_lr(separable, ["seg", "nat"], ["bal"], reg_param=0.0)
    scored = score(model, separable, id_cols=["id"])
    assert scored.columns == ["id", "label", "prediction", "p0", "p1"]
    probs = scored.select(F.min("p1"), F.max("p1")).head()
    assert 0.0 <= probs[0] <= probs[1] <= 1.0
    # the label is a clean linear margin — near-perfect separation
    assert auc(scored) > 0.95


def test_crossvalidate_selects_model(separable):
    from ent_fins_lakehouse_spark.ml.pipeline import crossvalidate, score

    cv = crossvalidate(
        separable, ["seg"], ["bal"], reg_params=(0.1, 0.01), num_folds=3
    )
    assert len(cv.avgMetrics) == 2
    scored = score(cv.bestModel, separable, id_cols=["id"])
    assert scored.count() == 600


def test_confusion_net_exact(spark):
    from ent_fins_lakehouse_spark.ml.pipeline import confusion_net

    scored = spark.createDataFrame(
        [
            (0.0, 0.0, 10.0),
            (0.0, 0.0, 20.0),
            (0.0, 1.0, 5.0),
            (1.0, 1.0, 7.0),
        ],
        "label DOUBLE, prediction DOUBLE, net DOUBLE",
    )
    got = {
        (r["label"], r["prediction"]): (r["n"], r["sum_net"])
        for r in confusion_net(scored, "net").collect()
    }
    assert got == {(0.0, 0.0): (2, 30.0), (0.0, 1.0): (1, 5.0), (1.0, 1.0): (1, 7.0)}


def test_feature_registry_materialize(spark, tmp_path):
    from ent_fins_lakehouse_spark.ml.features import FeatureRegistry
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    reg = FeatureRegistry()

    @reg.register("f1", keys=["id"], description="doubling")
    def f1(spark):
        return spark.range(5).withColumn("x2", F.col("id") * 2)

    assert reg.names() == ["f1"]
    assert reg.spec("f1").keys == ["id"]
    path = str(tmp_path / "f1")
    reg.materialize("f1", path, spark)
    back = LakeTable(spark, path).read()
    assert back.count() == 5
    assert {r["x2"] for r in back.collect()} == {0, 2, 4, 6, 8}


def test_tracking_shim_records_locally():
    from ent_fins_lakehouse_spark.ml import tracking

    with tracking.tracking_run("t") as run:
        tracking.log_params({"regParam": 0.1})
        tracking.log_metrics({"auc": 0.9})
    if not tracking._HAVE_MLFLOW:
        assert tracking.local_runs()[-1]["params"]["regParam"] == 0.1
        assert tracking.local_runs()[-1]["metrics"]["auc"] == 0.9


def test_glm_train_score_auc_floor(separable):
    """q365's estimator (VERDICT r9 item 8): GeneralizedLinearRegression
    with binomial/logit IS logistic regression fit by IRLS — on the
    separable fixture it must rank near-perfectly, emit calibrated
    probabilities in [0,1], and agree with the LR twin's AUC."""
    from ent_fins_lakehouse_spark.ml.pipeline import (
        _strip_training_summaries,
        auc,
        score,
        train_glm,
        train_lr,
    )

    glm = train_glm(separable, ["seg", "nat"], ["bal"], reg_param=0.0)
    _strip_training_summaries(glm)
    scored = glm.transform(separable).select(
        "id", "label", F.col("prediction").alias("p1")
    )
    lo, hi = scored.select(F.min("p1"), F.max("p1")).head()
    assert 0.0 <= lo <= hi <= 1.0
    glm_auc = auc(scored)
    assert glm_auc > 0.95
    lr = train_lr(separable, ["seg", "nat"], ["bal"], reg_param=0.0)
    lr_auc = auc(score(lr, separable, id_cols=["id"]))
    assert abs(glm_auc - lr_auc) < 0.02, "same model family, same ranking"


def test_glm_query_schema(spark):
    """q365 returns the frozen-head confusion payload (VERDICT r12
    item 4): stable schema, non-negative counts covering the held-out
    rows, and the live-fit booleans folded TRUE."""
    from ent_fins_lakehouse_spark.plans.registry import queries_map

    df = queries_map()["q365_ml_glm_train_score"](spark, "/root/testdata/sf0.001")
    assert df.columns == [
        "label_i",
        "pred_i",
        "n",
        "sum_margin",
        "glm_auc_band_ok",
        "glm_tracks_frozen_ok",
    ]
    rows = df.collect()
    assert rows and all(r.label_i in (0, 1) and r.pred_i in (0, 1) for r in rows)
    assert sum(r.n for r in rows) > 0
    assert all(r.glm_auc_band_ok and r.glm_tracks_frozen_ok for r in rows)


def test_frozen_head_sql_is_engine_portable(spark, duck):
    """The frozen scoring head is ONE expression string both engines
    parse: per-row margins from Spark and DuckDB agree bit-for-bit on
    the sf0.001 held-out rows (the property the q72/q73/q365 hashes
    ride on)."""
    from ent_fins_lakehouse_spark.plans.ml_queries import (
        frozen_z_sql,
        ml_dataset,
    )
    from pyspark.sql import functions as F

    got = {
        r["o_orderkey"]: r["z"]
        for r in ml_dataset(spark, "/root/testdata/sf0.001")
        .filter(F.col("order_year") > 1997)
        .select("o_orderkey", F.expr(frozen_z_sql()).alias("z"))
        .collect()
    }
    want = dict(
        duck.execute(
            f"""
            WITH v AS (
                SELECT o_orderkey,
                       c_mktsegment,
                       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
                       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                       CAST(EXTRACT(year FROM o_orderdate) AS DOUBLE)
                           AS order_year
                FROM orders
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                WHERE EXTRACT(year FROM o_orderdate) > 1997
            )
            SELECT o_orderkey, {frozen_z_sql()} AS z FROM v
            """
        ).fetchall()
    )
    assert got == want  # exact float equality, not approx
