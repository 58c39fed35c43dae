"""Feature engineering: ~50 technical-indicator columns, Spark-native.

Re-expresses reference src/features/engineering.py on one multi-symbol
DataFrame. The reference holds one eager frame per symbol and loops in
Python (reference src/main.py:63-87); here every sequence operator is a
window over ``Window.partitionBy(symbol).orderBy(datetime)`` — a single
hash exchange on ``symbol``, after which all ~50 columns compute in one
whole-stage-codegen'd Window stage, embarrassingly parallel across
symbols and spill-safe at any data size.

Semantics faithfully preserved (SURVEY.md §2 traps):
  T1  rolling aggregates NULL until the window is full (windows.py)
  T2  cyclic encodings use the literal 3.14159, not pi
      (reference src/features/engineering.py:187-192)
  F6  day_of_week is Monday=1..Sunday=7 (Polars convention,
      reference engineering.py:180) — Spark's ``weekday()`` is
      Monday=0, hence the +1
  eps all guarded divisions use + 1e-10, never nullif/try_divide
      (reference engineering.py:45,96,105,114)
Within one Polars ``with_columns`` batch, expressions see the *input*
frame; a Spark ``select("*", ...)`` has identical semantics, so derived
expressions are inlined rather than chained.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from marketdatapipeline_spark.features.ewm import add_technical_ewm_features
from marketdatapipeline_spark.features.windows import rolling_mean, rolling_std, rolling_sum

EPS = 1e-10
#: Reference uses this literal, not math.pi (engineering.py:187-192).
PI_LITERAL = 3.14159


def _base_window(symbol_col: str, order_cols: tuple[str, ...]) -> WindowSpec:
    return Window.partitionBy(symbol_col).orderBy(*[F.col(c) for c in order_cols])


def _require(df: DataFrame, cols: tuple[str, ...]) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"Required column(s) {missing} not present")


def compute_technical_features(
    df: DataFrame,
    rsi_period: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
    bb_period: int = 20,
    bb_std: float = 2.0,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime",),
) -> DataFrame:
    """RSI, MACD, Bollinger Bands (reference engineering.py:7-70).

    Bollinger is pure rolling mean/std → native windows; RSI/MACD need
    EWMA → one applyInPandas pass (see features/ewm.py).
    """
    _require(df, ("close",))
    w = _base_window(symbol_col, order_cols)

    out = add_technical_ewm_features(
        df,
        rsi_period=rsi_period,
        macd_fast=macd_fast,
        macd_slow=macd_slow,
        macd_signal=macd_signal,
        symbol_col=symbol_col,
        order_cols=order_cols,
    )

    close = F.col("close")
    sma = rolling_mean(close, bb_period, w)
    std = rolling_std(close, bb_period, w)
    upper = sma + (std * bb_std)
    lower = sma - (std * bb_std)
    return out.withColumns(
        {
            "bb_middle": sma,
            "bb_upper": upper,
            "bb_lower": lower,
            "bb_width": (upper - lower) / sma,
        }
    )


def momentum_expressions(
    periods: tuple[int, ...],
    w: WindowSpec,
    close: Column = None,
) -> dict[str, Column]:
    """return/momentum/roc/sma/distance_sma per period
    (reference engineering.py:73-117)."""
    close = close if close is not None else F.col("close")
    exprs: dict[str, Column] = {}
    for p in periods:
        shifted = F.lag(close, p).over(w)
        ret = (close - shifted) / (shifted + F.lit(EPS))
        sma = rolling_mean(close, p, w)
        exprs[f"return_{p}"] = ret
        exprs[f"momentum_{p}"] = close - shifted
        exprs[f"roc_{p}"] = ret * 100
        exprs[f"sma_{p}"] = sma
        exprs[f"distance_sma_{p}"] = (close - sma) / (sma + F.lit(EPS)) * 100
    return exprs


def compute_momentum_features(
    df: DataFrame,
    periods: tuple[int, ...] = (5, 10, 20, 50),
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime",),
) -> DataFrame:
    _require(df, ("close",))
    w = _base_window(symbol_col, order_cols)
    return df.withColumns(momentum_expressions(tuple(periods), w))


def volatility_expressions(
    windows: tuple[int, ...],
    w: WindowSpec,
    has_hl: bool,
) -> dict[str, Column]:
    """returns + volatility/realized_vol/hl_range per window
    (reference engineering.py:120-157). ``returns`` is pct_change:
    (x - lag x) / lag x, NULL on each symbol's first row."""
    close = F.col("close")
    prev = F.lag(close, 1).over(w)
    returns = (close - prev) / prev
    exprs: dict[str, Column] = {"returns": returns}
    for n in windows:
        exprs[f"volatility_{n}"] = rolling_std(returns, n, w)
        exprs[f"realized_vol_{n}"] = rolling_sum(F.pow(returns, 2), n, w)
        if has_hl:
            hl = (F.col("high") - F.col("low")) / close
            exprs[f"hl_range_{n}"] = rolling_mean(hl, n, w)
    return exprs


def compute_volatility_features(
    df: DataFrame,
    windows: tuple[int, ...] = (10, 20, 60),
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime",),
) -> DataFrame:
    _require(df, ("close",))
    w = _base_window(symbol_col, order_cols)
    has_hl = "high" in df.columns and "low" in df.columns
    return df.withColumns(volatility_expressions(tuple(windows), w, has_hl))


def temporal_expressions(datetime_col: str = "datetime") -> dict[str, Column]:
    """Calendar + cyclic-encoded features (reference engineering.py:160-195).

    day_of_week follows Polars (Mon=1..Sun=7): Spark weekday() is Mon=0.
    Cyclic encodings reuse the *output* integer columns in the reference
    (second with_columns batch) — same here via direct expressions.
    """
    ts = F.col(datetime_col)
    cal = {
        "hour": F.hour(ts),
        "minute": F.minute(ts),
        "day_of_week": F.weekday(ts) + F.lit(1),
        "day": F.dayofmonth(ts),
        "month": F.month(ts),
    }
    two_pi = 2 * PI_LITERAL
    cyc = {}
    for name, period in (("hour", 24), ("day_of_week", 7), ("month", 12)):
        angle = cal[name] * two_pi / period
        cyc[f"{name}_sin"] = F.sin(angle)
        cyc[f"{name}_cos"] = F.cos(angle)
    return {**cal, **cyc}


def compute_temporal_features(
    df: DataFrame, datetime_col: str = "datetime"
) -> DataFrame:
    _require(df, (datetime_col,))
    return df.withColumns(temporal_expressions(datetime_col))


def compute_all_features(
    df: DataFrame,
    datetime_col: str = "datetime",
    momentum_periods: tuple[int, ...] | None = None,
    volatility_windows: tuple[int, ...] | None = None,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] | None = None,
    rsi_period: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
    bb_period: int = 20,
    bb_std: float = 2.0,
) -> DataFrame:
    """All feature families (reference engineering.py:198-226): 7 input
    columns (symbol + OHLCV + datetime) -> 55; generate_targets adds the
    56th. One applyInPandas pass (EWMA) + one native Window stage.
    """
    momentum_periods = tuple(momentum_periods or (5, 10, 20, 50))
    volatility_windows = tuple(volatility_windows or (10, 20, 60))
    order_cols = tuple(order_cols or (datetime_col,))

    df = compute_technical_features(
        df,
        rsi_period=rsi_period,
        macd_fast=macd_fast,
        macd_slow=macd_slow,
        macd_signal=macd_signal,
        bb_period=bb_period,
        bb_std=bb_std,
        symbol_col=symbol_col,
        order_cols=order_cols,
    )
    w = _base_window(symbol_col, order_cols)
    has_hl = "high" in df.columns and "low" in df.columns
    exprs = {
        **momentum_expressions(momentum_periods, w),
        **volatility_expressions(volatility_windows, w, has_hl),
        **temporal_expressions(datetime_col),
    }
    return df.withColumns(exprs)
