"""Heikin-Ashi candles — the smoothed OHLC transform.

``ha_close = (o+h+l+c)/4`` is per-row, but ``ha_open`` is a genuine
recursion: ``ha_open_t = (ha_open_{t-1} + ha_close_{t-1}) / 2``,
seeded ``(o_1+c_1)/2``. The trick that keeps this distributed: the
recursion is EXACTLY an EWMA — ``y_t = 0.5 y_{t-1} + 0.5 x_t`` with
``x_1 = (o_1+c_1)/2`` (the seed) and ``x_t = ha_close_{t-1}``
after — i.e. ``ewm(alpha=0.5, adjust=False)`` over a shifted input,
and alpha 0.5 is span 3. So ha_open rides the repo's block-parallel
linear-recurrence scan (features/ewm.py:ewm_mean_blocked): O(blocks)
sequential work, unbounded per-symbol history safe — no per-symbol
pandas scan, no driver loop.

Geometric decay means a block boundary's carry is bit-associated
slightly differently from a single sequential scan; parity vs the
literal pandas recursion is pinned at ~1e-12 relative
(tests/test_randomized_market.py), the same contract as the Wilder
ATR twin. No SQL oracle (recursion has no bounded-depth SQL form at
100k rows — the ewm_indicators precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["heikin_ashi"]


def heikin_ashi(
    df: DataFrame,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    block_size: int = 100_000,
) -> DataFrame:
    """Add ``ha_open``, ``ha_high``, ``ha_low``, ``ha_close``.

    ``ha_high = max(high, ha_open, ha_close)`` and ``ha_low``
    symmetrically — per-row picks over the recursive open."""
    from marketdatapipeline_spark.features.ewm import ewm_mean_blocked

    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    hc = (
        F.col("open") + F.col("high") + F.col("low") + F.col("close")
    ) / F.lit(4.0)
    seed = (F.col("open") + F.col("close")) / F.lit(2.0)
    staged = df.withColumn("_hac", hc).withColumn(
        "_x", F.coalesce(F.lag(F.col("_hac")).over(w), seed)
    )
    out = ewm_mean_blocked(
        staged,
        "_x",
        span=3,  # alpha = 2/(span+1) = 0.5 — THE Heikin-Ashi recursion
        out_col="ha_open",
        adjust=False,
        symbol_col=symbol_col,
        order_cols=order_cols,
        block_size=block_size,
    )
    return (
        out.withColumn("ha_close", F.col("_hac"))
        .withColumn(
            "ha_high", F.greatest(F.col("high"), F.col("ha_open"), F.col("ha_close"))
        )
        .withColumn(
            "ha_low", F.least(F.col("low"), F.col("ha_open"), F.col("ha_close"))
        )
        .drop("_hac", "_x")
    )
