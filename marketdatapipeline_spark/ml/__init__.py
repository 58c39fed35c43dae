"""ML surface (reference src/ml/): dataset prep, training, evaluation,
prediction — Spark-native where the work is data-parallel (splits,
metrics, inference), driver-side only for the model fit itself."""

from marketdatapipeline_spark.ml.evaluation import (
    classification_metrics,
    classification_report_dict,
    confusion_matrix,
    evaluate_model,
    feature_importance_top_k,
    plot_feature_importance,
    regression_metrics,
    roc_auc,
)
from marketdatapipeline_spark.ml.drift import calibration_curve, psi_drift
from marketdatapipeline_spark.ml.labeling import triple_barrier_labels
from marketdatapipeline_spark.ml.prediction import load_model, predict
from marketdatapipeline_spark.ml.scaling import (
    apply_standardizer,
    apply_winsorizer,
    fit_winsorizer,
    scale_split,
    fit_standardizer,
    standardize_split,
)
from marketdatapipeline_spark.ml.preparation import (
    assign_time_segments,
    chronological_split,
    walk_forward_folds,
    feature_columns,
    prepare_dataset,
)
from marketdatapipeline_spark.ml.training import save_model, train_model
from marketdatapipeline_spark.ml.validation import cross_validate, grid_search

__all__ = [
    "assign_time_segments",
    "chronological_split",
    "walk_forward_folds",
    "cross_validate",
    "grid_search",
    "classification_metrics",
    "classification_report_dict",
    "confusion_matrix",
    "evaluate_model",
    "feature_columns",
    "feature_importance_top_k",
    "plot_feature_importance",
    "load_model",
    "predict",
    "prepare_dataset",
    "regression_metrics",
    "roc_auc",
    "save_model",
    "train_model",
    "triple_barrier_labels",
    "apply_standardizer",
    "fit_standardizer",
    "standardize_split",
    "calibration_curve",
    "psi_drift",
    "apply_winsorizer",
    "fit_winsorizer",
    "scale_split",
]
