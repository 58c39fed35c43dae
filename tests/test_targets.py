"""Target generation (reference src/features/targets.py)."""

from __future__ import annotations

import numpy as np
import pytest

from marketdatapipeline_spark.features import generate_targets


def test_classification_target(spark, bars_df, bars_pdf):
    got = generate_targets(bars_df, horizon=1).orderBy("symbol", "datetime").toPandas()
    base = bars_pdf.sort_values(["symbol", "datetime"]).reset_index(drop=True)
    fwd = base.groupby("symbol", sort=True)["close"].shift(-1)
    exp = ((fwd - base["close"]) / base["close"] > 0).astype("float64")
    exp[fwd.isna()] = np.nan
    exp = exp.dropna()
    # last row per symbol dropped
    assert len(got) == len(base) - base["symbol"].nunique()
    assert (got["target"].to_numpy() == exp.to_numpy()).all()
    assert dict(got.dtypes)["target"] == np.int8


def test_regression_target_horizon_3(spark, bars_df, bars_pdf):
    got = generate_targets(bars_df, horizon=3, target_type="regression")
    pdf = got.orderBy("symbol", "datetime").toPandas()
    base = bars_pdf.sort_values(["symbol", "datetime"]).reset_index(drop=True)
    fwd = base.groupby("symbol", sort=True)["close"].shift(-3)
    exp = ((fwd - base["close"]) / base["close"]).dropna()
    assert len(pdf) == len(exp)
    assert np.allclose(pdf["target"].to_numpy(), exp.to_numpy())


def test_bad_target_type_raises(spark, bars_df):
    with pytest.raises(ValueError, match="Unsupported target type"):
        generate_targets(bars_df, target_type="nope")


def test_missing_close_raises(spark, bars_df):
    with pytest.raises(ValueError, match="close"):
        generate_targets(bars_df.drop("close"))
