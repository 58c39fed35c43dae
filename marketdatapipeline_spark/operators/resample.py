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

_FIXED_UNIT_SECONDS = {
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "week": 604800.0,
}


def _fixed_interval_seconds(expected: str) -> float:
    """Parse ``'<n> <unit>[s]'`` into seconds, fixed-length units
    only. Calendar units (month, year) are rejected — they have no
    single second length, so a wall-second gap threshold built from
    them is a lie (see :func:`detect_gaps`)."""
    parts = expected.strip().split()
    if len(parts) == 2:
        count, unit = parts
    elif len(parts) == 1:
        count, unit = "1", parts[0]
    else:
        count = unit = ""
    unit = unit.lower().rstrip("s") if unit else unit
    try:
        n = float(count)
    except ValueError:
        n = float("nan")
    if unit not in _FIXED_UNIT_SECONDS or not n > 0:
        raise ValueError(
            "expected must be '<n> <second|minute|hour|day|week>[s]' "
            f"(fixed-length units only), got {expected!r}"
        )
    return n * _FIXED_UNIT_SECONDS[unit]


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

    ``expected`` must name a FIXED-LENGTH cadence — ``'<n>
    <second|minute|hour|day|week>[s]'`` — because the comparison is in
    wall seconds. Calendar units (month/year) have no fixed second
    length, and the pre-r9 anchor-date trick ('add the interval to
    2000-01-01 and subtract') silently evaluated '1 month' as
    31 January days and could mis-measure day intervals across a DST
    transition in the session timezone (ADVICE r8); those now raise.

    One lag window per symbol, filter — scan-shaped, no Python, no
    second exchange."""
    exp_s = F.lit(_fixed_interval_seconds(expected))
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
