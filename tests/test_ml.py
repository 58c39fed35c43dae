"""ML layer: prep, split, train (fallback model), metrics, inference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from marketdatapipeline_spark.features import compute_all_features
from marketdatapipeline_spark.ml import (
    chronological_split,
    classification_metrics,
    confusion_matrix,
    feature_columns,
    feature_importance_top_k,
    load_model,
    predict,
    prepare_dataset,
    regression_metrics,
    save_model,
    train_model,
)


@pytest.fixture(scope="module")
def featured(spark, bars_df):
    return compute_all_features(bars_df, target_horizon=1).cache()


def test_feature_columns_exclusion(featured):
    cols = feature_columns(featured)
    assert "target" not in cols and "close" not in cols and "symbol" not in cols
    assert "rsi" in cols and "sma_20" in cols
    assert len(cols) == 49  # reference: 49 features (SURVEY.md §2.8)


def test_chronological_split_is_ordered(spark, featured):
    train, test = chronological_split(featured, test_size=0.2)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == featured.count()
    assert abs(n_train - 0.8 * featured.count()) <= 1
    assert (
        train.agg(F.max("datetime")).first()[0]
        <= test.agg(F.min("datetime")).first()[0]
    )


def test_chronological_split_cutkey_matches_rownumber(spark):
    """The distributed cut-key path must reproduce the row_number cut
    exactly — counts AND membership — including boundary-timestamp
    ties split by the deterministic tie-break."""
    import pandas as pd

    n = 1000
    pdf = pd.DataFrame(
        {
            # 4 rows per timestamp -> the 80% boundary lands inside a tie group
            "datetime": pd.date_range("2024-01-01", periods=n // 4, freq="1min").repeat(4),
            "bar_id": range(n),
            "x": [i * 0.5 for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf)
    for ts in (0.2, 0.25, 0.301):
        a_train, a_test = chronological_split(
            df, test_size=ts, order_cols=("datetime",), method="rownumber"
        )
        b_train, b_test = chronological_split(
            df, test_size=ts, order_cols=("datetime",), method="cutkey"
        )
        assert a_train.count() == b_train.count() == int((1 - ts) * n)
        assert a_test.count() == b_test.count()
        a_ids = {r.bar_id for r in a_train.select("bar_id").collect()}
        b_ids = {r.bar_id for r in b_train.select("bar_id").collect()}
        assert a_ids == b_ids, f"membership diverged at test_size={ts}"


def test_prepare_dataset_numpy_contract(featured):
    X_train, X_test, y_train, y_test, names = prepare_dataset(featured, as_numpy=True)
    assert X_train.shape[1] == len(names) == 49
    assert X_train.shape[0] == y_train.shape[0]
    assert not np.isnan(X_train).any()  # drop_nulls removed warmup rows


def test_train_evaluate_predict_roundtrip(spark, featured, tmp_path):
    train, test, names = prepare_dataset(featured)
    pdf = train.toPandas()
    model = train_model(
        pdf[names].to_numpy("float64"),
        pdf["target"].to_numpy("float64"),
        save_path=str(tmp_path / "m.pkl"),
    )
    scored = predict(model, test, names, return_proba=True)
    assert "prediction" in scored.columns and "probability" in scored.columns
    m = classification_metrics(scored).first()
    assert 0.0 <= m.accuracy <= 1.0 and 0.0 <= m.f1 <= 1.0
    cm = confusion_matrix(scored)
    assert cm.agg(F.sum("n")).first()[0] == test.count()
    # persistence roundtrip
    back = load_model(str(tmp_path / "m.pkl"))
    p1 = model.predict(pdf[names].to_numpy("float64")[:5])
    p2 = back.predict(pdf[names].to_numpy("float64")[:5])
    assert (p1 == p2).all()
    # importance top-k
    top = feature_importance_top_k(spark, model, names, top_n=5)
    assert top.count() == 5


def test_regression_metrics_known_values(spark):
    rows = [(1.0, 1.5), (2.0, 1.5), (3.0, 3.5), (4.0, 3.5)]
    df = spark.createDataFrame(rows, ["target", "prediction"])
    m = regression_metrics(df).first()
    assert abs(m.mse - 0.25) < 1e-12
    assert abs(m.rmse - 0.5) < 1e-12
    assert abs(m.mae - 0.5) < 1e-12
    # r2 = 1 - ss_res/ss_tot = 1 - 1.0/5.0
    assert abs(m.r2 - 0.8) < 1e-12


def test_classification_metrics_zero_division(spark):
    # all-negative predictions: precision undefined -> 0 (sklearn convention)
    rows = [(1, 0), (0, 0), (1, 0)]
    df = spark.createDataFrame(rows, ["target", "prediction"])
    m = classification_metrics(df).first()
    assert m.precision == 0.0 and m.recall == 0.0 and m.f1 == 0.0
    assert abs(m.accuracy - 1 / 3) < 1e-12
