"""ML dataflow surface (SURVEY.md §2.11, M1-M14).

Re-expresses the reference's loan-risk scoring pipeline
(`/root/reference/Instructor/03-Fraud-ML.py`) as a library over the
driver's tables: feature engineering → Spark ML pipeline (indexer →
one-hot → impute → assemble → scale → logistic regression) → cross-
validated fit → DataFrame scoring — with the RDD probability-
extraction escape hatch (`03-Fraud-ML.py:189-195`) replaced by the
idiomatic ``vector_to_array`` projection.
"""

from ent_fins_lakehouse_spark.ml.pipeline import (
    build_feature_pipeline,
    crossvalidate,
    score,
    train_lr,
)
from ent_fins_lakehouse_spark.ml.features import feature_table, FeatureRegistry
from ent_fins_lakehouse_spark.ml.tracking import log_metrics, log_params, tracking_run

__all__ = [
    "build_feature_pipeline",
    "crossvalidate",
    "score",
    "train_lr",
    "feature_table",
    "FeatureRegistry",
    "log_metrics",
    "log_params",
    "tracking_run",
]
