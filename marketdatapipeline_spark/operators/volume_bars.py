"""Volume bars and dollar bars — activity-clocked resampling.

Time bars oversample quiet periods and undersample bursts; sampling
on a *volume clock* (close a bar every ``bucket_size`` units traded)
yields series with better statistical properties for ML (closer to
IID Gaussian returns — Lopez de Prado, *Advances in Financial
Machine Learning*, ch. 2). The reference engine has no counterpart;
this is north-star scale work for the training-data pipeline.

Plan shape: ONE window exchange per symbol for the running volume
(the bucket assignment is a projection over it), then one
(symbol, bucket) hash aggregation — map-side combinable, no second
shuffle when AQE coalesces, never a driver loop. The running sum is
cumulative from each symbol's first bar: with integer-valued volumes
(any realistic feed) every prefix sum is exact in any association
order, so bucket boundaries are engine-independent and the DuckDB
oracle matches cell-for-cell. Dollar mode accumulates
``price * volume`` as ``decimal(38,18)`` for the same
association-free guarantee on fractional flows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["volume_bars"]

_DEC = "decimal(38,18)"


def volume_bars(
    df: DataFrame,
    bucket_size: float,
    mode: str = "volume",
    price_col: str = "close",
    volume_col: str = "volume",
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """Resample per-symbol bars onto a volume (or dollar) clock.

    Each input row is assigned to the bucket its *starting* cumulative
    activity falls in (``floor(cum_before / bucket_size)``) — a row is
    never split, so bucket totals can overshoot ``bucket_size`` by at
    most one row's activity, the standard discrete-clock convention.

    Returns one row per (symbol, bucket): ``n_bars``, OHLC (open from
    the bucket's first row, close from its last, exact min/max
    high/low), exact summed ``volume``, ``start_ts``/``end_ts``, and
    a decimal-summed ``vwap``.

    ``mode='volume'`` clocks on ``volume_col``; ``mode='dollar'`` on
    ``price * volume`` (accumulated as decimal so fractional dollar
    flows stay association-free).
    """
    if mode not in ("volume", "dollar"):
        raise ValueError(f"mode must be 'volume' or 'dollar', got {mode!r}")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    if mode == "volume":
        clock = F.col(volume_col)
        cum = F.sum(clock).over(run)
        start_cum = cum - clock
        bucket = F.floor(start_cum / F.lit(float(bucket_size)))
    else:
        clock = (F.col(price_col) * F.col(volume_col)).cast(_DEC)
        # the PRIOR cumulative comes from a strictly-before frame, not
        # from subtracting the current term (r9): cum - clock is a
        # (38,18)-(38,18) decimal subtraction, which Spark's
        # allowPrecisionLoss rescales to (38,17) — 1 ulp of rounding
        # that can push a start_cum sitting 1e-18 below a bucket
        # multiple ONTO the boundary and flip the floor. The
        # (unboundedPreceding, -1) frame is still evaluated
        # incrementally (UnboundedPrecedingWindowFunctionFrame takes
        # any fixed upper offset), involves NO arithmetic beyond the
        # exact decimal accumulation, and shares the window node.
        start_cum = F.coalesce(
            F.sum(clock).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast(_DEC),
        )
        bucket = F.floor(
            start_cum.cast("double") / F.lit(float(bucket_size))
        )
    rn = F.row_number().over(w)
    staged = df.select(
        F.col(symbol_col).alias("symbol"),
        bucket.alias("bucket"),
        rn.alias("_rn"),
        F.col(time_col).alias("_ts"),
        F.col("open").alias("_open"),
        F.col("high").alias("_high"),
        F.col("low").alias("_low"),
        F.col(price_col).alias("_close"),
        F.col(volume_col).alias("_vol"),
    )
    pv = (F.col("_close") * F.col("_vol")).cast(_DEC)
    g = staged.groupBy("symbol", "bucket").agg(
        F.count(F.lit(1)).alias("n_bars"),
        F.min_by("_open", "_rn").alias("open"),
        F.max("_high").alias("high"),
        F.min("_low").alias("low"),
        F.max_by("_close", "_rn").alias("close"),
        F.sum("_vol").alias("bar_volume"),
        F.min("_ts").alias("start_ts"),
        F.max("_ts").alias("end_ts"),
        F.sum(pv).cast("double").alias("_pv"),
    )
    return g.select(
        "symbol",
        "bucket",
        "n_bars",
        "open",
        "high",
        "low",
        "close",
        "bar_volume",
        "start_ts",
        "end_ts",
        (F.col("_pv") / F.col("bar_volume")).alias("vwap"),
    )
