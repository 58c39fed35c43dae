"""Liquidity metrics per symbol — Amihud illiquidity and turnover
statistics, the standard cross-sectional liquidity screens.

One window exchange (per-symbol returns) + one aggregation; per-bar
terms are cast to ``decimal(38,18)`` before the grouped sum so the
accumulation is association-free and a DuckDB oracle matches
bit-for-bit (the repo's exact-sum convention), with the final scalar
division in identically-ordered double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["amihud_illiquidity"]

_DEC = "decimal(38,18)"


def amihud_illiquidity(
    df: DataFrame,
    price_col: str = "close",
    volume_col: str = "volume",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    scale: float = 1e6,
) -> DataFrame:
    """(symbol, n_obs, amihud, dollar_volume): the Amihud (2002)
    illiquidity ratio ``scale * avg(|ret| / (price * volume))`` — the
    price impact per unit of dollar volume — plus the total dollar
    volume over the same bars. Zero-dollar-volume bars are excluded
    (the ratio is undefined there), mirroring the paper's convention
    of dropping no-trade days."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    ret = (F.col(price_col) - prev) / prev
    dollar = F.col(price_col) * F.col(volume_col)
    per_bar = df.select(
        F.col(symbol_col),
        ret.alias("_ret"),
        dollar.alias("_dv"),
    ).filter(F.col("_ret").isNotNull() & (F.col("_dv") > 0))
    term = F.abs(F.col("_ret")) / F.col("_dv")
    g = per_bar.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(term.cast(_DEC)).cast("double").alias("_s"),
        F.sum(F.col("_dv").cast(_DEC)).cast("double").alias("dollar_volume"),
    )
    return g.select(
        symbol_col,
        "n_obs",
        (F.lit(float(scale)) * F.col("_s") / F.col("n_obs").cast("double")).alias(
            "amihud"
        ),
        "dollar_volume",
    )
