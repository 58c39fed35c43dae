"""Intraday seasonality profile — mean/dispersion of returns by
time-of-day bucket, the U-shape diagnostic every execution desk keeps
(volatility and volume concentrate at the open/close; a scheduler
that ignores the profile pays it).

One symbol window for returns, one (symbol, bucket) aggregation of
decimal(38,18) power sums — map-side combinable, the group count is
symbols x buckets regardless of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seasonality_profile"]

_DEC = "decimal(38,18)"


def seasonality_profile(
    df: DataFrame,
    bucket: str = "hour",
    price_col: str = "close",
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, bucket, n_obs, mean_return, std_return): simple-return
    moments per (symbol, time-of-day bucket) — ``bucket`` is ``hour``
    (0-23), ``minute`` (0-59 within the hour), or ``weekday``
    (1=Sunday..7, Spark ``dayofweek``). Std is the ddof=1 sample
    standard deviation, null when fewer than 2 observations or when
    the co-moment difference rounds negative (constant returns)."""
    extract = {
        "hour": F.hour,
        "minute": F.minute,
        "weekday": F.dayofweek,
    }
    if bucket not in extract:
        raise ValueError(f"unknown bucket kind: {bucket!r}")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    ret = (F.col(price_col) - prev) / prev
    per = df.select(
        F.col(symbol_col),
        extract[bucket](F.col(time_col)).alias("bucket"),
        ret.alias("_ret"),
    ).filter(F.col("_ret").isNotNull())
    g = per.groupBy(symbol_col, "bucket").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_ret").cast(_DEC)).cast("double").alias("_s1"),
        F.sum((F.col("_ret") * F.col("_ret")).cast(_DEC))
        .cast("double")
        .alias("_s2"),
    )
    n = F.col("n_obs").cast("double")
    var_s = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - 1)
    return g.select(
        symbol_col,
        "bucket",
        "n_obs",
        (F.col("_s1") / n).alias("mean_return"),
        F.when((F.col("n_obs") >= 2) & (var_s >= 0), F.sqrt(var_s)).alias(
            "std_return"
        ),
    )
