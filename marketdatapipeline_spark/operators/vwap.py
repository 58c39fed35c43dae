"""Anchored VWAP — the volume-weighted average price since an anchor
boundary (session/day/week), the reference point intraday execution
and mean-reversion features are built against.

``vwap_t = Σ(price·volume) / Σ(volume)`` with both running sums
anchored at the (symbol, period) boundary: one window exchange on
(symbol, anchor), cumulative frames, no Python. Engines may associate
the double sums differently (Spark scans sequentially, DuckDB uses
segment trees), so catalog exposure rounds to 6 — the same convention
as every other windowed double in the catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["anchored_twap", "anchored_vwap"]

_ANCHORS = {"day": "dd", "week": "week", "month": "month"}


def anchored_vwap(
    df: DataFrame,
    anchor: str = "day",
    price_col: str = "close",
    volume_col: str = "volume",
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    exact_decimal: bool = False,
) -> DataFrame:
    """Add ``vwap`` (running anchored VWAP) and ``vwap_dev`` (price
    minus vwap). Anchor ``day``/``week``/``month`` truncates the event
    time to the period start; every period restarts the accumulation.

    ``exact_decimal=True`` accumulates over ``decimal(28,10)``: the
    per-row double product quantizes identically in any engine and
    decimal addition is associativity-free, so the running sums (and
    therefore the vwap doubles) are bit-identical regardless of the
    engine's accumulation order — at sf0.1 one row in 100k landed on a
    round-to-6 boundary from double association before this. Costs
    ~2x on the sum kernel; the default double path is fine whenever
    results feed models rather than an exact cross-engine compare.
    """
    if anchor not in _ANCHORS:
        raise ValueError(f"anchor must be one of {sorted(_ANCHORS)}")
    period: Column = F.date_trunc(_ANCHORS[anchor], F.col(time_col))
    w = (
        Window.partitionBy(symbol_col, period)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pv_term = F.col(price_col) * F.col(volume_col)
    v_term = F.col(volume_col)
    if exact_decimal:
        pv_term = pv_term.cast("decimal(28,10)")
        v_term = v_term.cast("decimal(28,10)")
    pv = F.sum(pv_term).over(w)
    v = F.sum(v_term).over(w)
    if exact_decimal:
        pv, v = pv.cast("double"), v.cast("double")
    # Explicit zero-volume guard: NULL when the running volume is zero.
    # Unguarded division would CRASH under ANSI mode (Spark 4 default)
    # the first time a period opens on zero-volume ticks — a
    # data-dependent failure at scale — and the streaming twin
    # (streaming/vwap.py) emits None for the same rows, so NULL is the
    # documented convention across the whole parity triangle.
    vwap = F.when(v != 0, pv / v)
    return df.withColumns(
        {"vwap": vwap, "vwap_dev": F.col(price_col) - vwap}
    )


def anchored_twap(
    df: DataFrame,
    anchor: str = "day",
    price_col: str = "close",
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    exact_decimal: bool = False,
) -> DataFrame:
    """Add ``twap`` (running TIME-weighted average price since the
    anchor boundary — the volume-free execution benchmark quoted next
    to VWAP) and ``twap_dev`` (price minus twap).

    ``twap_t = Σ price / n`` over the rows since the (symbol, period)
    anchor: the same single (symbol, anchor) window exchange as
    :func:`anchored_vwap`, cumulative frame, no Python. A TWAP is
    never null (every row contributes weight 1, so the denominator is
    the running row count >= 1). ``exact_decimal`` buys bit-identical
    cross-engine accumulation exactly as documented on
    :func:`anchored_vwap`.
    """
    if anchor not in _ANCHORS:
        raise ValueError(f"anchor must be one of {sorted(_ANCHORS)}")
    period: Column = F.date_trunc(_ANCHORS[anchor], F.col(time_col))
    w = (
        Window.partitionBy(symbol_col, period)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p_term = F.col(price_col)
    if exact_decimal:
        p_term = p_term.cast("decimal(28,10)")
    s = F.sum(p_term).over(w)
    if exact_decimal:
        s = s.cast("double")
    twap = s / F.count(F.lit(1)).over(w)
    return df.withColumns(
        {"twap": twap, "twap_dev": F.col(price_col) - twap}
    )
