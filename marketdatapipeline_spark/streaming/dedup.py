"""Streaming deduplication — the event-time twin of the batch exact
dedup (textops.dedup.exact_duplicate_groups keeps min-id per hash; the
streaming form keeps FIRST-SEEN per key).

Two modes, both engine-managed state, no Python in the loop:

* :func:`dedup_stream` — ``dropDuplicatesWithinWatermark``: a record
  is a duplicate if a record with the same keys arrived within the
  watermark horizon. State is bounded by the watermark (keys older
  than the horizon are evicted), which is the only formulation that
  survives an unbounded feed: exact global dedup on a stream would
  need unbounded state by definition. At 100 TB/day the horizon is a
  policy knob — dupes in real feeds (retries, replays, at-least-once
  sources) cluster within minutes of the original.
* :func:`dedup_batch` — the batch twin over a bounded frame (keeps
  the min-event-time row per key, deterministic full-row tie-break).

Parity contract, stated precisely: the streaming operator keeps the
first-ARRIVED record per key; the batch twin keeps the min-EVENT-TIME
record. On an in-order feed (arrival order == event-time order per
key) the two coincide, and that is what the parity test pins — a
horizon >= the frame's span then emits exactly the batch survivors.
On an out-of-order feed they legitimately differ: a late-arriving
earlier-timestamped duplicate is suppressed by the stream (its key is
already claimed) but would win in the batch twin. That asymmetry is
inherent to one-pass streaming dedup, not a bug in either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...],
    watermark: str = "1 hour",
    time_col: str = "ts",
) -> DataFrame:
    """First-seen-wins streaming dedup on ``keys``.

    The watermark bounds both lateness and dedup state: a duplicate
    arriving later than ``watermark`` after the original is NOT
    suppressed (its key has been evicted) — the deliberate
    state-for-recall trade every streaming dedup makes.
    """
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        [*keys]
    )


def dedup_batch(
    events: DataFrame,
    keys: tuple[str, ...],
    time_col: str = "ts",
    tie_break: tuple[str, ...] | None = None,
) -> DataFrame:
    """Batch twin: keep each key's first row (min ``time_col``, then
    ``tie_break`` columns), same columns as the input.

    ``tie_break=None`` (default) orders ties by every remaining column
    (name-sorted), so the survivor among rows sharing (keys, time) is
    deterministic without the caller having to remember to ask."""
    if tie_break is None:
        used = set(keys) | {time_col}
        tie_break = tuple(sorted(c for c in events.columns if c not in used))
    w = Window.partitionBy(*keys).orderBy(time_col, *tie_break)
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
