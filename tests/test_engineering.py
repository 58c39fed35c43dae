"""Feature engineering parity with the reference's Polars semantics.

Expectations computed with pandas (whose rolling/ewm semantics match
Polars for the parameters used — reference src/features/engineering.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from marketdatapipeline_spark.features import compute_all_features, generate_targets
from marketdatapipeline_spark.features.engineering import (
    compute_momentum_features,
    compute_temporal_features,
    compute_volatility_features,
)

EPS = 1e-10


def _sorted_pdf(df):
    return df.orderBy("symbol", "datetime").toPandas()


def test_momentum_features_match_pandas(spark, bars_df, bars_pdf):
    got = _sorted_pdf(compute_momentum_features(bars_df))
    base = bars_pdf.sort_values(["symbol", "datetime"]).reset_index(drop=True)
    grouped = base.groupby("symbol", sort=True)["close"]
    for p in (5, 10, 20, 50):
        shifted = grouped.shift(p)
        exp_ret = (base["close"] - shifted) / (shifted + EPS)
        assert np.allclose(got[f"return_{p}"], exp_ret, equal_nan=True)
        assert np.allclose(got[f"momentum_{p}"], base["close"] - shifted, equal_nan=True)
        assert np.allclose(got[f"roc_{p}"], exp_ret * 100, equal_nan=True)
        sma = (
            base.groupby("symbol", sort=True)["close"]
            .rolling(p, min_periods=p)
            .mean()
            .reset_index(drop=True)
        )
        assert np.allclose(got[f"sma_{p}"], sma, equal_nan=True)
        assert np.allclose(
            got[f"distance_sma_{p}"],
            (base["close"] - sma) / (sma + EPS) * 100,
            equal_nan=True,
        )


def test_volatility_features_match_pandas(spark, bars_df, bars_pdf):
    got = _sorted_pdf(compute_volatility_features(bars_df))
    base = bars_pdf.sort_values(["symbol", "datetime"]).reset_index(drop=True)
    rets = base.groupby("symbol", sort=True)["close"].pct_change()
    assert np.allclose(got["returns"], rets, equal_nan=True)
    tmp = base.assign(returns=rets, hl=(base["high"] - base["low"]) / base["close"])
    for n in (10, 20, 60):
        vol = (
            tmp.groupby("symbol", sort=True)["returns"]
            .rolling(n, min_periods=n)
            .std(ddof=1)
            .reset_index(drop=True)
        )
        assert np.allclose(got[f"volatility_{n}"], vol, equal_nan=True)
        rv = (
            tmp.assign(r2=tmp["returns"] ** 2)
            .groupby("symbol", sort=True)["r2"]
            .rolling(n, min_periods=n)
            .sum()
            .reset_index(drop=True)
        )
        assert np.allclose(got[f"realized_vol_{n}"], rv, equal_nan=True)
        hl = (
            tmp.groupby("symbol", sort=True)["hl"]
            .rolling(n, min_periods=n)
            .mean()
            .reset_index(drop=True)
        )
        assert np.allclose(got[f"hl_range_{n}"], hl, equal_nan=True)


def test_temporal_traps_t2_f6(spark, bars_df, bars_pdf):
    got = _sorted_pdf(compute_temporal_features(bars_df))
    base = bars_pdf.sort_values(["symbol", "datetime"]).reset_index(drop=True)
    ts = pd.to_datetime(base["datetime"])
    # F6: Polars weekday convention Mon=1..Sun=7
    assert (got["day_of_week"].to_numpy() == (ts.dt.weekday + 1).to_numpy()).all()
    assert (got["hour"].to_numpy() == ts.dt.hour.to_numpy()).all()
    assert (got["minute"].to_numpy() == ts.dt.minute.to_numpy()).all()
    assert (got["day"].to_numpy() == ts.dt.day.to_numpy()).all()
    assert (got["month"].to_numpy() == ts.dt.month.to_numpy()).all()
    # T2: the literal 3.14159 (NOT math.pi)
    two_pi = 2 * 3.14159
    assert np.allclose(got["hour_sin"], np.sin(ts.dt.hour * two_pi / 24))
    assert np.allclose(got["month_cos"], np.cos(ts.dt.month * two_pi / 12))
    assert np.allclose(got["day_of_week_sin"], np.sin((ts.dt.weekday + 1) * two_pi / 7))


def test_all_features_column_contract(spark, bars_df):
    """6 OHLCV inputs + symbol -> 55 feature columns; +target = 56+symbol
    (SURVEY.md §2.8: reference emits 56 columns on a symbol-less frame)."""
    out = generate_targets(compute_all_features(bars_df))
    expected = {
        "symbol", "datetime", "open", "high", "low", "close", "volume",
        "rsi", "macd", "macd_signal", "macd_histogram",
        "bb_middle", "bb_upper", "bb_lower", "bb_width",
        "returns", "hour", "minute", "day_of_week", "day", "month",
        "hour_sin", "hour_cos", "day_of_week_sin", "day_of_week_cos",
        "month_sin", "month_cos", "target",
    }
    for p in (5, 10, 20, 50):
        expected |= {f"return_{p}", f"momentum_{p}", f"roc_{p}", f"sma_{p}", f"distance_sma_{p}"}
    for n in (10, 20, 60):
        expected |= {f"volatility_{n}", f"realized_vol_{n}", f"hl_range_{n}"}
    assert set(out.columns) == expected
    assert len(out.columns) == 57  # reference's 56 + the symbol column
