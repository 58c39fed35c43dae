"""Candlestick pattern detection — per-bar boolean flags for the
classic OHLC patterns, plus the per-symbol pattern census.

Everything is division-free comparison logic (scaled multiplication
instead of ratios) over the bar's own OHLC and one ``lag`` of the
previous bar, so the only exchange is the per-symbol window and every
flag is deterministic across engines — the census oracle-checks as
exact integer counts.

Definitions (standard, made exact):

* **doji** — body within a tenth of the range:
  ``|close - open| * 10 <= (high - low)``.
* **hammer** — long lower shadow, small body near the top:
  range >= 3 * body AND lower shadow >= 2 * body AND
  upper shadow <= body.
* **bullish engulfing** — previous bar red, this bar green, and this
  body engulfs the previous body:
  ``prev_close < prev_open AND close > open AND open <= prev_close
  AND close >= prev_open``.
* **bearish engulfing** — the mirror image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["candlestick_flags", "candlestick_census"]


def candlestick_flags(
    df: DataFrame,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """Add ``is_doji``, ``is_hammer``, ``is_bull_engulf``,
    ``is_bear_engulf`` (int 0/1; the engulfing flags are 0 on each
    symbol's first bar — no previous body to engulf)."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    o, h, lo, c = (F.col(x) for x in ("open", "high", "low", "close"))
    body = F.abs(c - o)
    rng = h - lo
    upper = h - F.greatest(o, c)
    lower = F.least(o, c) - lo
    po = F.lag(o).over(w)
    pc = F.lag(c).over(w)

    doji = (body * F.lit(10.0)) <= rng
    hammer = (
        (rng >= body * F.lit(3.0))
        & (lower >= body * F.lit(2.0))
        & (upper <= body)
        & (rng > 0)
    )
    bull = (pc < po) & (c > o) & (o <= pc) & (c >= po)
    bear = (pc > po) & (c < o) & (o >= pc) & (c <= po)
    return df.withColumns(
        {
            "is_doji": doji.cast("int"),
            "is_hammer": hammer.cast("int"),
            "is_bull_engulf": F.coalesce(bull.cast("int"), F.lit(0)),
            "is_bear_engulf": F.coalesce(bear.cast("int"), F.lit(0)),
        }
    )


def candlestick_census(
    df: DataFrame,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, n_bars, doji_n, hammer_n, bull_engulf_n,
    bear_engulf_n): exact pattern counts per symbol — the map-side-
    combinable census over the flags."""
    flags = candlestick_flags(df, symbol_col, order_cols)
    return flags.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_bars"),
        F.sum("is_doji").alias("doji_n"),
        F.sum("is_hammer").alias("hammer_n"),
        F.sum("is_bull_engulf").alias("bull_engulf_n"),
        F.sum("is_bear_engulf").alias("bear_engulf_n"),
    )
