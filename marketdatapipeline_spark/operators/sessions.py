"""Gap-based sessionization.

Assigns every event to a session: a new session starts when the
user's previous event is MORE than ``gap`` in the past (``ts > prev +
gap`` — events exactly ``gap`` apart still merge, matching Spark's
native ``session_window``, whose per-event window [t, t+gap] is
inclusive at the end, so the batch and streaming paths draw identical
boundaries; verified empirically and by randomized test; see
streaming/sessions.py). The standard two-window composition — ``lag``
to detect session starts, running ``sum`` of the start flags to
number them — runs in ONE shuffle on the user key (both windows share
the same partitioning and sort, so Catalyst plans a single exchange +
sort feeding two window functions).

At 100 TB this is the plan you want: per-user work after one hash
exchange, no driver state, no iteration. The same shape backs web-log
sessionization in every warehouse; Structured Streaming's
``session_window`` is the streaming twin (see streaming/bars.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap: Column,
    user_col: str = "user_id",
    time_col: str = "ts",
    tie_break: tuple[str, ...] = (),
) -> DataFrame:
    """Append ``session_id`` (1-based per user, in time order) and
    ``is_session_start``.

    ``gap`` is an interval expression (e.g.
    ``F.expr("INTERVAL 30 MINUTES")``). ``tie_break`` columns make the
    ordering of equal-timestamp events deterministic.
    """
    order = [F.col(time_col), *[F.col(c) for c in tie_break]]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(time_col).over(w)
    start = (prev.isNull() | (F.col(time_col) > prev + gap)).cast("int")
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("is_session_start", start).withColumn(
        "session_id", F.sum("is_session_start").over(running).cast("bigint")
    )


def session_stats(
    df: DataFrame,
    gap: Column,
    user_col: str = "user_id",
    time_col: str = "ts",
    tie_break: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (user, session): bounds, event count, duration in
    seconds. A single aggregation over :func:`sessionize` output."""
    s = sessionize(df, gap, user_col, time_col, tie_break)
    # unix_micros rejects TIMESTAMP_NTZ (the parquet default); the
    # cast is offset-safe here because the duration subtraction
    # cancels any session-timezone shift.
    ts_as_tz = lambda c: c.cast("timestamp")  # noqa: E731
    return s.groupBy(user_col, "session_id").agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (
            F.unix_micros(ts_as_tz(F.max(time_col)))
            - F.unix_micros(ts_as_tz(F.min(time_col)))
        ).alias("duration_us"),
    )
