"""Running-peak drawdown — per symbol, the cumulative maximum of a
price series and the fractional distance below it, the risk metric
behind max-drawdown reporting and stop-out logic.

Plan shape: one cumulative-max window per symbol (a single exchange;
max over doubles is association-free, so there is no cross-engine
accumulation concern at all), then scalar arithmetic. ``drawdown`` is
``close/peak - 1`` (<= 0, exactly 0.0 at each new peak); the identical
scalar division orders the same in any engine, so round-6 compares
need no decimal machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["running_drawdown"]


def running_drawdown(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """Add ``peak`` (running max of ``price_col``) and ``drawdown``
    (``price/peak - 1``). The first row of each symbol is its own peak
    (drawdown exactly 0.0)."""
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max(F.col(price_col)).over(w)
    return df.withColumns(
        {"peak": peak, "drawdown": F.col(price_col) / peak - F.lit(1.0)}
    )
