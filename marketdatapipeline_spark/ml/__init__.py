"""ML surface (reference src/ml/): dataset prep, training, evaluation,
prediction — Spark-native where the work is data-parallel (splits,
metrics, inference), driver-side only for the model fit itself."""

from marketdatapipeline_spark.ml.evaluation import (
    classification_metrics,
    confusion_matrix,
    feature_importance_top_k,
    regression_metrics,
)
from marketdatapipeline_spark.ml.prediction import load_model, predict
from marketdatapipeline_spark.ml.preparation import (
    chronological_split,
    feature_columns,
    prepare_dataset,
)
from marketdatapipeline_spark.ml.training import save_model, train_model

__all__ = [
    "chronological_split",
    "classification_metrics",
    "confusion_matrix",
    "feature_columns",
    "feature_importance_top_k",
    "load_model",
    "predict",
    "prepare_dataset",
    "regression_metrics",
    "save_model",
    "train_model",
]
