"""Arrow engine vs SQL engine: same 56-column output, same values."""

from __future__ import annotations

import numpy as np

from marketdatapipeline_spark.features import compute_all_features


def test_engines_agree(spark, bars_df):
    a = (
        compute_all_features(bars_df, engine="arrow", target_horizon=1)
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    s = (
        compute_all_features(bars_df, engine="sql", target_horizon=1)
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    assert list(sorted(a.columns)) == list(sorted(s.columns))
    assert len(a) == len(s)
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(
                a[c].to_numpy("float64"),
                s[c].to_numpy("float64"),
                rtol=1e-9,
                atol=1e-9,
                equal_nan=True,
            ), c
        else:
            assert (a[c].to_numpy() == s[c].to_numpy()).all(), c


def test_arrow_engine_column_contract(spark, bars_df):
    out = compute_all_features(bars_df, engine="arrow", target_horizon=1)
    assert len(out.columns) == 57  # reference's 56 + symbol (SURVEY.md §2.8)
    assert "target" in out.columns and dict(out.dtypes)["target"] == "tinyint"


def test_arrow_engine_regression_target(spark, bars_df):
    out = compute_all_features(
        bars_df, engine="arrow", target_horizon=3, target_type="regression"
    )
    assert dict(out.dtypes)["target"] == "double"
    n_syms = bars_df.select("symbol").distinct().count()
    assert out.count() == bars_df.count() - 3 * n_syms
