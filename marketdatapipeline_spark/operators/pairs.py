"""Pairs-trading spread and rolling z-score for one symbol pair —
the signal a statistical-arbitrage desk monitors: the log price
spread ``ln(P_a) - ln(P_b)`` and how many rolling standard deviations
it sits from its rolling mean.

Alignment is the house bar-index convention (operators/correlation.py):
each symbol's non-null prices are ranked per symbol and index i of A
pairs with index i of B — dense, gap-free. The two legs collapse into
ONE frame via conditional aggregation on the index (no self-join:
``groupBy(_idx).agg(max(when(sym=a)), max(when(sym=b)))``), then the
rolling stats are two cumulative-window expressions.

Scale note: a single pair's aligned series is one symbol's history —
the same per-partition footprint as every per-symbol window in this
package — so the rolling window runs in ONE task by construction
(Window.partitionBy a constant). That is not a scale-killer, it is
the data shape; for a BOOK of pairs, call once per pair (each call is
independent) or lift ``symbol_a``/``symbol_b`` into a pair-key column
and partition on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pair_spread_zscore"]

_DEC = "decimal(38,18)"


def pair_spread_zscore(
    df: DataFrame,
    symbol_a: str,
    symbol_b: str,
    window: int = 20,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(bar_index, price_a, price_b, spread, spread_mean, spread_std,
    zscore): the log spread with trailing-``window`` mean / std
    (ddof=1) and z-score, null until the window fills (the
    min_periods=window convention of features/windows.py) or when the
    window's spread is constant (zero std).

    The rolling sums accumulate as ``decimal(38,18)`` so the oracle
    agrees bit-for-bit; the z-score is assembled in double."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if symbol_a == symbol_b:
        raise ValueError("symbol_a and symbol_b must differ")
    two = df.filter(
        F.col(symbol_col).isin([symbol_a, symbol_b])
        & F.col(price_col).isNotNull()
    ).select(
        F.col(symbol_col).alias("_sym"),
        F.row_number().over(
            Window.partitionBy(symbol_col).orderBy(*order_cols)
        ).alias("_idx"),
        F.col(price_col).alias("_p"),
    )
    aligned = (
        two.groupBy("_idx")
        .agg(
            F.max(F.when(F.col("_sym") == symbol_a, F.col("_p"))).alias(
                "price_a"
            ),
            F.max(F.when(F.col("_sym") == symbol_b, F.col("_p"))).alias(
                "price_b"
            ),
        )
        .filter(
            F.col("price_a").isNotNull() & F.col("price_b").isNotNull()
        )
        .withColumn(
            "spread", F.log(F.col("price_a")) - F.log(F.col("price_b"))
        )
    )
    roll = (
        Window.partitionBy(F.lit(1))
        .orderBy("_idx")
        .rowsBetween(-(window - 1), 0)
    )
    s = F.sum(F.col("spread").cast(_DEC)).over(roll).cast("double")
    ss = (
        F.sum((F.col("spread") * F.col("spread")).cast(_DEC))
        .over(roll)
        .cast("double")
    )
    n = F.count(F.lit(1)).over(roll)
    full = n == window
    mean = F.when(full, s / n)
    var = (ss - s * s / n) / (n - F.lit(1.0))
    std = F.when(full & (var >= 0), F.sqrt(var))
    z = F.when(std > 0, (F.col("spread") - mean) / std)
    return aligned.select(
        F.col("_idx").alias("bar_index"),
        "price_a",
        "price_b",
        "spread",
        mean.alias("spread_mean"),
        std.alias("spread_std"),
        z.alias("zscore"),
    )
