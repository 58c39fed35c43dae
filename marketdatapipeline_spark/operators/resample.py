"""Calendar resampling with forward fill — turn an irregular event
stream into a dense fixed-interval series (the shape every
downstream joiner, plotter, and model batcher wants), carrying the
last observation forward across empty buckets.

Plan shape: one aggregation to the (symbol, bucket) grain (max_by on
the (time, id) struct picks the in-bucket last observation
deterministically), a tiny per-symbol bounds aggregate whose
``sequence`` explode generates the dense grid (grid size depends on
the time span, not the row count — it never explodes with data
volume), a left join grid ⟕ observations, and one window with
``last(ignorenulls=True)`` for the fill. One exchange on symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["detect_gaps", "resample_ffill"]

_STEPS = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY", "minute": "INTERVAL 1 MINUTE"}


def resample_ffill(
    df: DataFrame,
    every: str = "hour",
    value_col: str = "close",
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    id_col: str = "bar_id",
) -> DataFrame:
    """Dense per-symbol ``bucket`` grid from the first to the last
    observed bucket, with ``observed`` (did this bucket have data) and
    ``{value_col}_ffill`` (last observation carried forward; the first
    bucket is always observed, so no leading nulls)."""
    if every not in _STEPS:
        raise ValueError(f"every must be one of {sorted(_STEPS)}")
    bucket = F.date_trunc(every, F.col(time_col))
    b = df.select(
        F.col(symbol_col),
        bucket.alias("_bucket"),
        F.col(time_col),
        F.col(id_col),
        F.col(value_col),
    )
    last_obs = b.groupBy(symbol_col, "_bucket").agg(
        F.max_by(
            F.col(value_col), F.struct(F.col(time_col), F.col(id_col))
        ).alias("_last")
    )
    bounds = b.groupBy(symbol_col).agg(
        F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
    )
    grid = bounds.select(
        F.col(symbol_col),
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(_STEPS[every]))
        ).alias("bucket"),
    )
    joined = grid.join(
        last_obs.withColumnRenamed("_bucket", "bucket"),
        [symbol_col, "bucket"],
        "left",
    )
    w = (
        Window.partitionBy(symbol_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        symbol_col,
        "bucket",
        F.col("_last").isNotNull().alias("observed"),
        F.last("_last", ignorenulls=True).over(w).alias(f"{value_col}_ffill"),
    )


def detect_gaps(
    df: DataFrame,
    expected: str = "1 hour",
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, gap_start, gap_end, gap_s, n_missing): per-symbol
    holes in the bar grid — consecutive bars further apart than the
    ``expected`` cadence, with the implied missing-bar count
    (``floor(gap / expected) - 1``). The feed-health audit run before
    trusting any window feature: a silent gap turns every trailing
    aggregate into a lie.

    One lag window per symbol, filter — scan-shaped, no Python, no
    second exchange."""
    iv = F.expr(f"INTERVAL {expected}")
    # TIMESTAMP_NTZ has no direct double cast; go through TIMESTAMP
    # (both operands shift identically, so the difference is exact)
    sec = (
        F.col("_next").cast("timestamp").cast("double")
        - F.col(time_col).cast("timestamp").cast("double")
    )
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    step = df.select(
        F.col(symbol_col),
        F.col(time_col),
        F.lead(F.col(time_col)).over(w).alias("_next"),
    ).filter(F.col("_next").isNotNull())
    exp_s = F.lit(None).cast("double")  # patched below via interval maths
    # interval length in seconds, computed engine-side so '90 minutes'
    # and '1 hour' both work without driver parsing
    exp_s = (
        F.to_timestamp(F.lit("2000-01-01 00:00:00")) + iv
    ).cast("double") - F.to_timestamp(
        F.lit("2000-01-01 00:00:00")
    ).cast("double")
    return (
        step.withColumn("gap_s", sec)
        .filter(F.col("gap_s") > exp_s)
        .select(
            symbol_col,
            F.col(time_col).alias("gap_start"),
            F.col("_next").alias("gap_end"),
            "gap_s",
            (F.floor(F.col("gap_s") / exp_s) - F.lit(1))
            .cast("int")
            .alias("n_missing"),
        )
    )
