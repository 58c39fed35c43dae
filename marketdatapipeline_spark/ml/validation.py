"""Walk-forward cross-validation — the model-selection loop on top of
``walk_forward_folds`` (ml/preparation.py).

The reference trains once on a single chronological split
(src/ml/training.py:17-69); serial market data can't use random
K-fold (it trains on the future), so the honest generalization
estimate is expanding-window walk-forward: fold i trains on the first
i time segments and validates on segment i+1. This module runs that
loop end-to-end: per-fold fit (the same ``train_model`` path the
pipeline uses — XGBoost when installed, deterministic numpy
otherwise), distributed scoring via the broadcast-model pandas UDF,
and metrics as Catalyst aggregations.

Scale: the segment assignment runs ONCE and is persisted (each fold
is a filter over it — no re-sort, no re-count per fold); scoring and
metric aggregation are fully distributed. The per-fold model fit is
driver-side by design below the distributed threshold, exactly like
``run_pipeline`` phase 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdatapipeline_spark.caching import scoped_persist
from marketdatapipeline_spark.ml.evaluation import (
    classification_metrics,
    regression_metrics,
    roc_auc,
)
from marketdatapipeline_spark.ml.preparation import (
    assign_time_segments,
    feature_columns,
)
from marketdatapipeline_spark.ml.prediction import predict
from marketdatapipeline_spark.ml.training import train_model

__all__ = ["cross_validate", "grid_search"]

#: metrics averaged into the aggregate block, per model type
_CLS_METRICS = ("accuracy", "precision", "recall", "f1")
_REG_METRICS = ("mse", "rmse", "mae", "r2")


def cross_validate(
    df: DataFrame,
    n_folds: int = 3,
    feature_cols: list[str] | None = None,
    target_col: str = "target",
    model_type: str = "classification",
    hyperparameters: dict | None = None,
    order_cols: tuple[str, ...] = ("datetime",),
) -> dict:
    """Expanding-window CV over ``n_folds`` (train, validation) pairs.

    Returns ``{"folds": [...], "aggregate": {...}}``: one dict per
    fold (fold number, train/validation row counts, the full metric
    set from ``classification_metrics`` / ``regression_metrics``,
    plus ``roc_auc`` when the model exposes probabilities) and the
    unweighted mean of each metric across folds — the number a model
    picker compares between hyperparameter candidates.

    Rows with a null feature or target are dropped first (the same
    hygiene as ``prepare_dataset``); segments are equal-row-count
    cuts of the CLEAN frame, so every fold's train/validation sizes
    are deterministic.
    """
    if n_folds < 1:
        raise ValueError("n_folds must be >= 1")
    if model_type not in ("classification", "regression"):
        raise ValueError(f"Unsupported model type: {model_type}")
    if target_col not in df.columns:
        raise ValueError(f"Target column '{target_col}' not present")
    feature_cols = feature_cols or feature_columns(df, target_col)

    clean = df.select(*order_cols, *feature_cols, target_col).na.drop(
        "any", subset=[*feature_cols, target_col]
    )
    # ONE segment assignment, persisted: every fold below is a cheap
    # filter over it instead of re-running the rank machinery
    seg = scoped_persist(
        assign_time_segments(
            clean, n_folds + 1, order_cols, segment_col="_seg"
        )
    )
    is_cls = model_type == "classification"
    metric_fn = classification_metrics if is_cls else regression_metrics
    metric_names = _CLS_METRICS if is_cls else _REG_METRICS

    folds = []
    for i in range(1, n_folds + 1):
        train = seg.filter(F.col("_seg") < i).drop("_seg")
        val = seg.filter(F.col("_seg") == i).drop("_seg")
        train_pdf = train.toPandas()
        model = train_model(
            train_pdf[feature_cols].to_numpy("float64"),
            train_pdf[target_col].to_numpy("float64"),
            model_type=model_type,
            hyperparameters=hyperparameters,
        )
        can_proba = is_cls and hasattr(model, "predict_proba")
        scored = predict(model, val, feature_cols, return_proba=can_proba)
        row = metric_fn(
            scored.withColumn(
                "prediction", F.col("prediction").cast("double")
            ),
            label_col=target_col,
        ).collect()[0]
        entry = {
            "fold": i,
            "n_train": len(train_pdf),
            "n_val": int(val.count()),
            **{k: float(row[k]) for k in metric_names},
        }
        if can_proba:
            entry["roc_auc"] = float(
                roc_auc(
                    scored.withColumn(
                        "probability", F.round("probability", 6)
                    ),
                    label_col=target_col,
                    score_col="probability",
                ).first()[0]
            )
        folds.append(entry)

    agg_names = list(metric_names) + (
        ["roc_auc"] if all("roc_auc" in f for f in folds) else []
    )
    aggregate = {
        k: sum(f[k] for f in folds) / len(folds) for k in agg_names
    }
    return {"folds": folds, "aggregate": aggregate}


def grid_search(
    df: DataFrame,
    param_grid: dict[str, list] | list[dict],
    n_folds: int = 3,
    feature_cols: list[str] | None = None,
    target_col: str = "target",
    model_type: str = "classification",
    selection_metric: str | None = None,
    order_cols: tuple[str, ...] = ("datetime",),
) -> dict:
    """Hyperparameter selection over walk-forward CV: run
    :func:`cross_validate` for every candidate and pick the best
    aggregate ``selection_metric`` (default: ``f1`` for
    classification — threshold-honest, unlike accuracy on skewed
    targets — and ``rmse`` for regression, minimized).

    ``param_grid`` is either a mapping of hyperparameter name →
    candidate values (the full cartesian product is swept) or an
    explicit list of hyperparameter dicts. Returns ``{"best_params",
    "best_score", "results"}``, where ``results`` carries each
    candidate's params and full CV report in sweep order.

    Scale notes: the candidates share nothing mutable, and each CV
    already persists its segment assignment once — the sweep costs
    ``len(grid) * n_folds`` fold fits. The driver-side loop is over
    CANDIDATES (a handful), never over rows; at cluster scale the
    per-fold scoring and metric aggregation inside each
    ``cross_validate`` stay fully distributed.
    """
    if isinstance(param_grid, dict):
        if not param_grid:
            raise ValueError("param_grid must name at least one parameter")
        keys = list(param_grid)
        combos: list[dict] = [{}]
        for k in keys:
            vals = list(param_grid[k])
            if not vals:
                raise ValueError(f"parameter {k!r} has no candidate values")
            combos = [{**c, k: v} for c in combos for v in vals]
    else:
        combos = [dict(c) for c in param_grid]
        if not combos:
            raise ValueError("param_grid must contain at least one candidate")

    is_cls = model_type == "classification"
    metric = selection_metric or ("f1" if is_cls else "rmse")
    # a metric is "higher is better" unless it is an error magnitude
    minimize = metric in ("mse", "rmse", "mae")

    results = []
    for params in combos:
        report = cross_validate(
            df,
            n_folds=n_folds,
            feature_cols=feature_cols,
            target_col=target_col,
            model_type=model_type,
            hyperparameters=params,
            order_cols=order_cols,
        )
        if metric not in report["aggregate"]:
            raise ValueError(
                f"selection metric {metric!r} not produced by "
                f"{model_type} CV (have {sorted(report['aggregate'])})"
            )
        results.append(
            {
                "params": params,
                "score": float(report["aggregate"][metric]),
                "cv": report,
            }
        )
    # strict comparisons: ties break to the EARLIEST candidate, so a
    # sweep is reproducible when several candidates score identically
    best = results[0]
    for r in results[1:]:
        if (r["score"] < best["score"]) if minimize else (r["score"] > best["score"]):
            best = r
    return {
        "best_params": best["params"],
        "best_score": best["score"],
        "selection_metric": metric,
        "results": results,
    }
