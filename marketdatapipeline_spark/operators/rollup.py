"""Multi-granularity OHLCV rollup (hypertable-style continuous
aggregate, batch form).

Rolls bar/tick data up to coarser time buckets — each output row is
one (symbol, grain, bucket) with open = first price in the bucket,
close = last, high/low = extrema, volume = sum. First/last are
``min_by``/``max_by`` on a deterministic (time, tie) struct — NOT
``first()``/``last()``, which are arrival-order dependent under
parallel aggregation and silently nondeterministic at scale.

Each granularity is one hash aggregation with map-side partials; the
grains are unioned with a ``grain`` discriminator column. At 100 TB
every grain is a single shuffle of partial aggregates (8 values per
(symbol, bucket) group), and coarser grains could optionally be
derived from finer ones (open of the first fine bucket, etc.) — kept
as independent aggregations here because partial-aggregate sizes make
the re-read cheaper than the extra plan coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: date_trunc units accepted for grains, finest-to-coarsest.
_UNITS = ("minute", "hour", "day", "week", "month", "quarter", "year")


def rollup_bars(
    df: DataFrame,
    grains: tuple[str, ...] = ("hour", "day"),
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    tie_col: str = "bar_id",
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    volume_col: str = "volume",
) -> DataFrame:
    """OHLCV at each requested granularity, unioned with a ``grain``
    column. Deterministic: first/last resolve (time, tie) order."""
    bad = [g for g in grains if g not in _UNITS]
    if bad:
        raise ValueError(f"unknown grain(s) {bad}; pick from {_UNITS}")
    key = F.struct(F.col(time_col), F.col(tie_col))
    out = None
    for grain in grains:
        g = (
            df.groupBy(
                F.col(symbol_col),
                F.date_trunc(grain, F.col(time_col)).alias("bucket"),
            )
            .agg(
                F.min_by(F.col(open_col), key).alias("open"),
                F.max(F.col(high_col)).alias("high"),
                F.min(F.col(low_col)).alias("low"),
                F.max_by(F.col(close_col), key).alias("close"),
                F.sum(F.col(volume_col)).alias("volume"),
                F.count("*").alias("n_bars"),
            )
            .withColumn("grain", F.lit(grain))
        )
        out = g if out is None else out.unionByName(g)
    return out
