"""Distributed model training — M2 at cluster scale (SURVEY §2.5).

The reference fits single-node XGBoost on a collected matrix
(reference src/ml/training.py:57-62), which ``train_model`` replicates
exactly and which is fine at reference data volumes. At 100 TB the
``toPandas()`` collect of the train split is the one driver-side
bottleneck left in the flagship pipeline, so ``run_pipeline`` routes
train splits larger than ``PipelineConfig.distributed_train_threshold``
here instead: the fit runs as Spark jobs and no training row ever
reaches the driver.

Backend selection (decided at call time, importable-first):

- ``xgboost.spark`` ``SparkXGBClassifier``/``SparkXGBRegressor`` when
  the library is present — the SURVEY §2.5 scale mapping: the same
  gradient-boosted-tree library the reference uses, with distributed
  histogram building across executors;
- otherwise ``pyspark.ml`` ``GBTClassifier``/``GBTRegressor`` — the
  in-box distributed gradient-boosted trees, with the reference's
  hyperparameter names mapped onto the Spark ML equivalents
  (n_estimators→maxIter, max_depth→maxDepth, learning_rate→stepSize,
  subsample→subsamplingRate, colsample_bytree→featureSubsetStrategy,
  random_state→seed). Not bit-compatible with XGBoost — it is the
  scale path, selected only above the row threshold.

Both backends ride one ``pyspark.ml.Pipeline`` (VectorAssembler +
estimator) wrapped in :class:`DistributedModel`, which mirrors the
driver-side model's surface where it matters downstream:
``transform`` emits the same ``prediction``/``probability`` columns the
broadcast-UDF ``predict`` path emits, ``feature_importances_`` feeds
``plot_feature_importance`` unchanged, and save/load round-trips via
Spark ML persistence plus a JSON sidecar.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLS_OBJ = "classification"
REG_OBJ = "regression"


def _has_xgboost_spark() -> bool:
    try:  # pragma: no cover - environment-dependent
        import xgboost.spark  # noqa: F401

        return True
    except ImportError:
        return False


def _gbt_estimator(model_type: str, params: dict, label_col: str):
    """pyspark.ml fallback estimator with mapped hyperparameters."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.regression import GBTRegressor

    kwargs = dict(
        featuresCol="features",
        labelCol=label_col,
        maxIter=int(params["n_estimators"]),
        maxDepth=int(params["max_depth"]),
        stepSize=float(params["learning_rate"]),
        subsamplingRate=float(params["subsample"]),
        # str(float(...)): an int 1 must become "1.0" (all features) —
        # Spark ML reads the bare string "1" as "one feature per split"
        featureSubsetStrategy=str(float(params["colsample_bytree"])),
        seed=int(params["random_state"]),
    )
    cls = GBTClassifier if model_type == CLS_OBJ else GBTRegressor
    return cls(**kwargs)


def _xgb_estimator(model_type: str, params: dict, label_col: str):
    """xgboost.spark estimator (same hyperparameter names as the
    reference's sklearn API)."""  # pragma: no cover - needs xgboost
    from xgboost.spark import SparkXGBClassifier, SparkXGBRegressor

    kwargs = dict(
        features_col="features",
        label_col=label_col,
        n_estimators=int(params["n_estimators"]),
        max_depth=int(params["max_depth"]),
        learning_rate=float(params["learning_rate"]),
        subsample=float(params["subsample"]),
        colsample_bytree=float(params["colsample_bytree"]),
        random_state=int(params["random_state"]),
    )
    cls = SparkXGBClassifier if model_type == CLS_OBJ else SparkXGBRegressor
    return cls(**kwargs)


@dataclass
class DistributedModel:
    """A fitted distributed pipeline plus the metadata to score with it."""

    pipeline_model: object  # pyspark.ml.PipelineModel
    feature_names: list[str]
    model_type: str
    backend: str  # "xgboost.spark" | "spark.ml"

    def transform(self, df: DataFrame) -> DataFrame:
        """Score ``df``, emitting the same columns the driver-side
        ``predict`` path emits: ``prediction`` (double) and, for
        classification, ``probability`` (P of class 1, double)."""
        from pyspark.ml.functions import vector_to_array

        out = self.pipeline_model.transform(df)
        drop = [c for c in ("features", "rawPrediction") if c in out.columns]
        if self.model_type == CLS_OBJ and "probability" in out.columns:
            out = out.withColumn(
                "probability", vector_to_array(F.col("probability"))[1]
            )
        return out.drop(*drop)

    @property
    def feature_importances_(self) -> np.ndarray:
        est = self.pipeline_model.stages[-1]
        imp = getattr(est, "featureImportances", None)
        if imp is None:  # pragma: no cover - xgboost.spark path
            booster = est.get_booster()
            scores = booster.get_score(importance_type="gain")
            arr = np.array(
                [scores.get(f"f{i}", 0.0) for i in range(len(self.feature_names))]
            )
        else:
            arr = np.array(imp.toArray())
        s = arr.sum()
        return arr / s if s > 0 else arr

    def save(self, path: str) -> None:
        self.pipeline_model.write().overwrite().save(os.path.join(path, "model"))
        meta = {
            "feature_names": self.feature_names,
            "model_type": self.model_type,
            "backend": self.backend,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "DistributedModel":
        from pyspark.ml import PipelineModel

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(
            pipeline_model=PipelineModel.load(os.path.join(path, "model")),
            feature_names=meta["feature_names"],
            model_type=meta["model_type"],
            backend=meta["backend"],
        )


def train_model_distributed(
    train_df: DataFrame,
    feature_names: list[str],
    target_col: str = "target",
    model_type: str = CLS_OBJ,
    hyperparameters: dict | None = None,
) -> DistributedModel:
    """Fit a gradient-boosted model without collecting the train split.

    One VectorAssembler + estimator pipeline; the only data movement is
    Spark's own shuffle inside tree building. Hyperparameter defaults
    are the reference's (training.py DEFAULT_HYPERPARAMETERS).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler

    from marketdatapipeline_spark.ml.training import DEFAULT_HYPERPARAMETERS

    if model_type not in (CLS_OBJ, REG_OBJ):
        raise ValueError(f"Unsupported model type: {model_type}")
    params = {**DEFAULT_HYPERPARAMETERS, **(hyperparameters or {})}

    assembler = VectorAssembler(
        inputCols=list(feature_names), outputCol="features"
    )
    if _has_xgboost_spark():  # pragma: no cover - needs xgboost
        backend = "xgboost.spark"
        est = _xgb_estimator(model_type, params, target_col)
    else:
        backend = "spark.ml"
        est = _gbt_estimator(model_type, params, target_col)

    fit_df = train_df.withColumn(
        target_col, F.col(target_col).cast("double")
    )
    model = Pipeline(stages=[assembler, est]).fit(fit_df)
    return DistributedModel(
        pipeline_model=model,
        feature_names=list(feature_names),
        model_type=model_type,
        backend=backend,
    )
