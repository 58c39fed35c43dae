"""EWMA exactness: pandas path (oracle-exact) and blocked scale path.

Reference semantics (src/features/engineering.py:36-57): RSI uses
``ewm(span=14, adjust=False)``; MACD EMAs use ``adjust=True`` (default).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from marketdatapipeline_spark.features.ewm import (
    add_technical_ewm_features,
    ewm_mean_blocked,
)

EPS = 1e-10


def _exp(pdf: pd.DataFrame) -> pd.DataFrame:
    outs = []
    for _, g in pdf.sort_values(["symbol", "datetime"]).groupby("symbol", sort=True):
        g = g.copy()
        close = g["close"]
        delta = close.diff()
        gain = (delta > 0).astype("float64") * delta
        loss = (delta < 0).astype("float64") * (-delta)
        rs = gain.ewm(span=14, adjust=False).mean() / (
            loss.ewm(span=14, adjust=False).mean() + EPS
        )
        g["rsi"] = 100.0 - 100.0 / (1.0 + rs)
        macd = close.ewm(span=12).mean() - close.ewm(span=26).mean()
        g["macd"] = macd
        g["macd_signal"] = macd.ewm(span=9).mean()
        g["macd_histogram"] = macd - g["macd_signal"]
        outs.append(g)
    return pd.concat(outs, ignore_index=True)


def test_technical_ewm_matches_pandas(spark, bars_df, bars_pdf):
    got = (
        add_technical_ewm_features(bars_df)
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    exp = _exp(bars_pdf)
    for c in ("rsi", "macd", "macd_signal", "macd_histogram"):
        assert np.allclose(got[c].to_numpy("float64"), exp[c], equal_nan=True), c
    # first row per symbol: delta is NULL -> rsi NULL (Polars propagation)
    firsts = got.groupby("symbol").head(1)
    assert firsts["rsi"].isna().all()
    # macd is defined from the first row (EMA seeds on x0)
    assert firsts["macd"].notna().all()


def test_native_ewm_matches_pandas_path(spark, bars_df, bars_pdf):
    """All-JVM blocked scan == pandas ewm to ~1e-12 relative."""
    from marketdatapipeline_spark.features.ewm import (
        add_technical_ewm_features_native,
    )

    got = (
        add_technical_ewm_features_native(bars_df)
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    exp = _exp(bars_pdf)
    for c in ("rsi", "macd", "macd_signal", "macd_histogram"):
        assert np.allclose(
            got[c].to_numpy("float64"), exp[c], rtol=1e-9, atol=1e-9, equal_nan=True
        ), c
    firsts = got.groupby("symbol").head(1)
    assert firsts["rsi"].isna().all()
    assert firsts["macd"].notna().all()


def test_native_ewm_multiblock(spark):
    """Series longer than one block: the carry path must be exact.

    Uses span 5 -> block_rows = 600/ln(3/2) ~ 1479... shrunk further by
    the B floor; build 4000 rows so several blocks occur."""
    import pandas as pd

    from marketdatapipeline_spark.features.ewm import add_ewm_native

    n = 4000
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * n,
            "datetime": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "close": 100.0 + np.sin(np.arange(n) * 0.37) * 5 + np.arange(n) * 0.01,
        }
    )
    df = spark.createDataFrame(pdf)
    out = add_ewm_native(
        df,
        {"e_t": ("close", 5, True), "e_f": ("close", 5, False)},
        order_cols=("datetime",),
    )
    got = out.orderBy("datetime").toPandas()
    exp_t = pdf["close"].ewm(span=5).mean().to_numpy()
    exp_f = pdf["close"].ewm(span=5, adjust=False).mean().to_numpy()
    assert np.allclose(got["e_t"].to_numpy("float64"), exp_t, rtol=1e-9, atol=1e-9)
    assert np.allclose(got["e_f"].to_numpy("float64"), exp_f, rtol=1e-9, atol=1e-9)


def test_native_ewm_long_span(spark):
    """Long spans need B >= 45/-ln(r): the old 2048 cap gave 1.7e-6
    rel. error at span=300 and 3.8e-2 at span=1000 (dropped r^B term)."""
    import pandas as pd

    from marketdatapipeline_spark.features.ewm import add_ewm_native, ewm_block_size

    n = 30000
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * n,
            "datetime": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "close": 100.0 + np.sin(np.arange(n) * 0.37) * 5 + np.arange(n) * 0.01,
        }
    )
    df = spark.createDataFrame(pdf)
    out = add_ewm_native(
        df,
        {"e_t": ("close", 300, True), "e_f": ("close", 1000, False)},
        order_cols=("datetime",),
    )
    got = out.orderBy("datetime").toPandas()
    exp_t = pdf["close"].ewm(span=300).mean().to_numpy()
    exp_f = pdf["close"].ewm(span=1000, adjust=False).mean().to_numpy()
    assert np.allclose(got["e_t"].to_numpy("float64"), exp_t, rtol=1e-12, atol=1e-12)
    assert np.allclose(got["e_f"].to_numpy("float64"), exp_f, rtol=1e-12, atol=1e-12)
    # incompatible span mix (ratio > ~13) must raise, not silently err
    with pytest.raises(ValueError, match="block size"):
        ewm_block_size([5, 1000])


def test_blocked_ewm_adjust_true_matches_pandas(spark, bars_df, bars_pdf):
    out = ewm_mean_blocked(
        bars_df, "close", span=12, out_col="e", adjust=True, block_size=17
    )
    got = out.orderBy("symbol", "datetime").toPandas()["e"].to_numpy("float64")
    exp = (
        bars_pdf.sort_values(["symbol", "datetime"])
        .groupby("symbol", sort=True)["close"]
        .apply(lambda s: s.ewm(span=12).mean())
        .to_numpy()
    )
    assert np.allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_blocked_ewm_adjust_false_matches_pandas(spark, bars_df, bars_pdf):
    out = ewm_mean_blocked(
        bars_df, "close", span=14, out_col="e", adjust=False, block_size=13
    )
    got = out.orderBy("symbol", "datetime").toPandas()["e"].to_numpy("float64")
    exp = (
        bars_pdf.sort_values(["symbol", "datetime"])
        .groupby("symbol", sort=True)["close"]
        .apply(lambda s: s.ewm(span=14, adjust=False).mean())
        .to_numpy()
    )
    assert np.allclose(got, exp, rtol=1e-12, atol=1e-12)


def test_native_ewm_random_data_with_varied_partition_sizes(spark):
    """Randomized parity for the blocked native scan: symbols with
    1-row, exactly-block-sized, and long histories, constant
    stretches (RSI 0/0 guard), and duplicate close values — all
    against the pandas reference."""
    from marketdatapipeline_spark.features.ewm import (
        add_technical_ewm_features_native,
    )

    rng = np.random.default_rng(20260814)
    base = pd.Timestamp("2024-01-01")
    frames = []
    for sym, n in (("one", 1), ("tiny", 3), ("mid", 257), ("long", 1500)):
        close = rng.normal(100, 10, n)
        if n >= 50:
            close[20:40] = 77.0  # constant stretch: gains = losses = 0
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "datetime": [
                        base + pd.Timedelta(minutes=int(i)) for i in range(n)
                    ],
                    "close": close,
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    got = (
        add_technical_ewm_features_native(spark.createDataFrame(pdf))
        .orderBy("symbol", "datetime")
        .toPandas()
    )
    exp = _exp(pdf)
    for c in ("rsi", "macd", "macd_signal", "macd_histogram"):
        assert np.allclose(
            got[c].to_numpy("float64"),
            exp[c].to_numpy("float64"),
            rtol=1e-9,
            atol=1e-9,
            equal_nan=True,
        ), c
