"""Distributed training path (ml/distributed.py — SURVEY §2.5 M2 at
scale). xgboost.spark is absent in this container, so the pyspark.ml
GBT backend is what actually fits; the xgboost branch shares the same
pipeline/assembler/wrapper plumbing exercised here."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from marketdatapipeline_spark.ml.distributed import (
    DistributedModel,
    train_model_distributed,
)


@pytest.fixture(scope="module")
def labeled_df(spark):
    """Small separable dataset: label depends on f1 via a noisy step."""
    rows = []
    for i in range(400):
        f1 = math.sin(i * 0.7) * 2.0
        f2 = math.cos(i * 1.3)
        noise = math.sin(i * 12.345) * 0.3
        rows.append(
            {
                "f1": f1,
                "f2": f2,
                "target": 1.0 if f1 + noise > 0 else 0.0,
                "yreg": 3.0 * f1 - 2.0 * f2 + noise,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def test_distributed_classifier_fits_and_scores(spark, labeled_df):
    model = train_model_distributed(
        labeled_df,
        ["f1", "f2"],
        target_col="target",
        model_type="classification",
        hyperparameters={"n_estimators": 10, "max_depth": 3},
    )
    assert model.backend in ("spark.ml", "xgboost.spark")
    scored = model.transform(labeled_df)
    pdf = scored.select("target", "prediction", "probability").toPandas()
    assert set(pdf["prediction"].unique()) <= {0.0, 1.0}
    assert ((pdf["probability"] >= 0) & (pdf["probability"] <= 1)).all()
    # separable-ish data: accuracy well above chance
    acc = (pdf["prediction"] == pdf["target"]).mean()
    assert acc > 0.9, acc
    imp = model.feature_importances_
    assert len(imp) == 2 and abs(imp.sum() - 1.0) < 1e-9
    # f1 drives the label; it must dominate
    assert imp[0] > imp[1]


def test_distributed_regressor_fits(spark, labeled_df):
    model = train_model_distributed(
        labeled_df,
        ["f1", "f2"],
        target_col="yreg",
        model_type="regression",
        hyperparameters={"n_estimators": 20, "max_depth": 4},
    )
    pdf = model.transform(labeled_df).select("yreg", "prediction").toPandas()
    resid = (pdf["yreg"] - pdf["prediction"]).abs()
    assert resid.mean() < 0.5, resid.mean()
    assert "probability" not in model.transform(labeled_df).columns


def test_distributed_model_save_load_roundtrip(spark, labeled_df, tmp_path):
    model = train_model_distributed(
        labeled_df,
        ["f1", "f2"],
        target_col="target",
        model_type="classification",
        hyperparameters={"n_estimators": 5, "max_depth": 2},
    )
    path = str(tmp_path / "dist_model")
    model.save(path)
    loaded = DistributedModel.load(spark, path)
    assert loaded.feature_names == ["f1", "f2"]
    assert loaded.model_type == "classification"
    a = model.transform(labeled_df).select("prediction").toPandas()
    b = loaded.transform(labeled_df).select("prediction").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_run_pipeline_routes_to_distributed(spark, tmp_path):
    """Threshold 0 forces the distributed branch end-to-end: no
    driver collect of the train split, metrics still computed."""
    from dataclasses import replace

    from marketdatapipeline_spark.config import DEFAULT_CONFIG
    from marketdatapipeline_spark.main import run_pipeline

    cfg = replace(
        DEFAULT_CONFIG,
        distributed_train_threshold=0,
        n_estimators=5,
        max_depth=2,
        base_dir=tmp_path,
    )
    summary = run_pipeline(
        spark,
        config=cfg,
        fixtures_dir="/root/testdata/sf0.001",
        symbols=("0", "1"),
        work_dir=str(tmp_path / "wd"),
    )
    assert summary["n_train"] > 0 and summary["n_test"] > 0
    assert "accuracy" in summary["metrics"] or "rmse" in summary["metrics"]
    assert "roc_auc" in summary["metrics"]
    assert "dist_" in summary["model_path"]


def test_train_model_distributed_rejects_bad_type(spark, labeled_df):
    with pytest.raises(ValueError, match="Unsupported model type"):
        train_model_distributed(labeled_df, ["f1"], model_type="ranking")
