"""Distributed batch inference (reference src/ml/prediction.py:34-71).

The reference projects features to numpy and calls ``model.predict``
on the driver; here the fitted model is broadcast and inference runs
as an Arrow-batched pandas UDF — fully distributed, no collect.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def load_model(path: str):
    """Pickle source (reference prediction.py:14-31)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def predict(
    model,
    df: DataFrame,
    feature_cols: list[str],
    return_proba: bool = False,
    prediction_col: str = "prediction",
) -> DataFrame:
    """Append ``prediction`` (and optionally ``probability``) columns.

    The model rides to executors via the broadcast that backs pandas
    UDF closures; each Arrow batch is scored vectorized.
    """
    missing = [c for c in feature_cols if c not in df.columns]
    if missing:
        raise ValueError(f"Feature column(s) {missing} not present")

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(pickle.dumps(model))

    @F.pandas_udf(DoubleType())
    def predict_udf(*cols: pd.Series) -> pd.Series:
        m = pickle.loads(bc.value)
        X = np.column_stack([c.to_numpy("float64") for c in cols])
        return pd.Series(np.asarray(m.predict(X), dtype="float64"))

    out = df.withColumn(prediction_col, predict_udf(*[F.col(c) for c in feature_cols]))
    if return_proba:
        @F.pandas_udf(DoubleType())
        def proba_udf(*cols: pd.Series) -> pd.Series:
            m = pickle.loads(bc.value)
            X = np.column_stack([c.to_numpy("float64") for c in cols])
            return pd.Series(m.predict_proba(X)[:, 1])

        out = out.withColumn("probability", proba_udf(*[F.col(c) for c in feature_cols]))
    return out
