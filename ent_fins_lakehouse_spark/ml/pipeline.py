"""Spark ML pipeline construction and scoring.

Mirrors `/root/reference/Instructor/03-Fraud-ML.py:118-199` operator by
operator (M1-M12 in SURVEY.md §2.11), generalized to arbitrary
categorical/numeric column lists instead of the hardcoded loan schema.

Scale notes: all stages are Spark ML estimators/transformers — fit
passes are distributed treeAggregate jobs; transform is a narrow map.
Nothing here collects data to the driver except the tiny fitted-model
parameters, so the same code runs unchanged on a 1000-executor
cluster. ``handleInvalid='keep'`` everywhere so scoring never throws
on categories unseen at fit time (exactly the reference's choice at
`03-Fraud-ML.py:124`).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import (
    Imputer,
    OneHotEncoder,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import GeneralizedLinearRegression
from pyspark.ml.tuning import CrossValidator, CrossValidatorModel, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_feature_pipeline(
    cat_cols: list[str],
    num_cols: list[str],
    label_col: str = "label",
    with_scaling: bool = True,
) -> Pipeline:
    """M1-M5,M7: indexers → one-hot → imputer → assembler → scaler.

    cf. `03-Fraud-ML.py:122-146` (indexers `:124`, OHE `:125`, Imputer
    `:126`, VectorAssembler `:134`, StandardScaler `:137-140`,
    Pipeline `:146`).
    """
    stages = []
    idx_cols = [f"{c}_idx" for c in cat_cols]
    ohe_cols = [f"{c}_ohe" for c in cat_cols]
    for c, ic in zip(cat_cols, idx_cols):
        stages.append(StringIndexer(inputCol=c, outputCol=ic, handleInvalid="keep"))
    if cat_cols:
        stages.append(OneHotEncoder(inputCols=idx_cols, outputCols=ohe_cols))
    imp_cols = [f"{c}_imp" for c in num_cols]
    if num_cols:
        stages.append(
            Imputer(inputCols=num_cols, outputCols=imp_cols, strategy="median")
        )
    assembled = ohe_cols + imp_cols
    stages.append(
        VectorAssembler(inputCols=assembled, outputCol="features_raw", handleInvalid="keep")
    )
    if with_scaling:
        stages.append(
            StandardScaler(
                inputCol="features_raw", outputCol="features", withStd=True, withMean=True
            )
        )
    return Pipeline(stages=stages)


def train_lr(
    df: DataFrame,
    cat_cols: list[str],
    num_cols: list[str],
    label_col: str = "label",
    max_iter: int = 10,
    elastic_net: float = 0.5,
    reg_param: float = 0.01,
) -> PipelineModel:
    """M6-M7: feature pipeline + LogisticRegression fit (no CV).

    cf. `03-Fraud-ML.py:143` (maxIter=10, elasticNetParam=0.5).
    """
    feats = build_feature_pipeline(cat_cols, num_cols, label_col)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        elasticNetParam=elastic_net,
        regParam=reg_param,
    )
    return Pipeline(stages=[feats, lr]).fit(df)


def train_glm(
    df: DataFrame,
    cat_cols: list[str],
    num_cols: list[str],
    label_col: str = "label",
    max_iter: int = 10,
    reg_param: float = 0.01,
) -> PipelineModel:
    """The reference's NOMINAL estimator: its MLflow run is literally
    named "glm" (`03-Fraud-ML.py:207`) even though the code fits
    LogisticRegression — this twin makes the name honest with
    GeneralizedLinearRegression(family='binomial', link='logit'), the
    same logistic model fit by IRLS instead of LBFGS. Distributed
    exactly like the LR path (per-iteration treeAggregate); transform
    emits ``prediction`` = the predicted MEAN (a probability under the
    logit link), not a probability vector — score with that column
    directly."""
    feats = build_feature_pipeline(cat_cols, num_cols, label_col)
    glm = GeneralizedLinearRegression(
        featuresCol="features",
        labelCol=label_col,
        family="binomial",
        link="logit",
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[feats, glm]).fit(df)


def crossvalidate(
    df: DataFrame,
    cat_cols: list[str],
    num_cols: list[str],
    label_col: str = "label",
    reg_params: tuple[float, ...] = (0.1, 0.01),
    num_folds: int = 5,
    parallelism: int = 4,
    seed: int = 42,
) -> CrossValidatorModel:
    """M8-M9: ParamGridBuilder × CrossValidator with a binary AUC
    evaluator. cf. `03-Fraud-ML.py:149-160` (5-fold, regParam grid
    {0.1, 0.01}). ``parallelism`` fits grid cells concurrently — on a
    cluster this overlaps the per-fold jobs."""
    feats = build_feature_pipeline(cat_cols, num_cols, label_col)
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col, maxIter=10, elasticNetParam=0.5
    )
    pipe = Pipeline(stages=[feats, lr])
    grid = ParamGridBuilder().addGrid(lr.regParam, list(reg_params)).build()
    evaluator = BinaryClassificationEvaluator(
        labelCol=label_col, metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=seed,
    )
    return cv.fit(df)


def _strip_training_summaries(model) -> None:
    """Clear per-stage training summaries (see :func:`score`): Scala's
    ``private[x]`` compiles to public bytecode, so the JVM models'
    ``setSummary(None)`` is callable through py4j."""
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    stages = getattr(model, "stages", None) or [model]
    for st in stages:
        jo = getattr(st, "_java_obj", None)
        if jo is None:
            continue
        try:
            if jo.hasSummary():
                jo.setSummary(jvm.scala.Option.empty())
        except Exception:
            continue  # stage type without a summary surface


def score(model, df: DataFrame, id_cols: list[str], label_col: str = "label") -> DataFrame:
    """M10 + U1 done right: model.transform, then project the
    probability vector with ``vector_to_array`` — replaces the
    reference's ``pred.rdd.map(extract).toDF(...)`` row-level escape
    hatch (`03-Fraud-ML.py:189-195`) with a JVM-side narrow map.
    Returns (ids..., label, prediction, p0, p1).

    Training summaries are STRIPPED before transform: the summary pins
    the fitting-time SparkSession into the scoring UDF's closure
    (LogisticRegressionModel.copy carries it, so copy() doesn't help),
    and a session whose ObservationManager has been instantiated by any
    ``df.observe`` is no longer closure-serializable — scoring must not
    depend on unrelated session history. We don't use summaries (AUC
    comes from the evaluator), so dropping them loses nothing."""
    _strip_training_summaries(model)
    pred = model.transform(df)
    prob = vector_to_array("probability")
    return pred.select(
        *id_cols,
        F.col(label_col),
        F.col("prediction"),
        prob[0].alias("p0"),
        prob[1].alias("p1"),
    )


def auc(scored: DataFrame, label_col: str = "label", prob_col: str = "p1") -> float:
    """M12 via the DataFrame evaluator (the reference used the RDD
    mllib metrics API, `03-Fraud-ML.py:197-199`)."""
    from pyspark.ml.feature import VectorAssembler as _VA  # noqa: F401 (doc parity)

    ev = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol=prob_col, metricName="areaUnderROC"
    )
    return float(ev.evaluate(scored.withColumn(prob_col, F.col(prob_col).cast("double"))))


def confusion_net(
    scored: DataFrame,
    net_col: str,
    label_col: str = "label",
    pred_col: str = "prediction",
) -> DataFrame:
    """M-series A6: business-value confusion matrix —
    groupBy(label, prediction).agg(count, sum(net)).
    cf. `03-Fraud-ML.py:231`."""
    return (
        scored.groupBy(label_col, pred_col)
        .agg(F.count("*").alias("n"), F.sum(net_col).alias("sum_net"))
        .orderBy(label_col, pred_col)
    )
