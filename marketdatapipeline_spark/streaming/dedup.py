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
* :func:`dedup_batch` — the batch twin with the same keep-first
  semantics over a bounded frame (first == min event time, tie-broken
  deterministically), used by the parity tests: a stream processed
  with a horizon >= the frame's whole time span must emit exactly the
  batch twin's survivors.
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
    tie_break: tuple[str, ...] = (),
) -> DataFrame:
    """Batch twin: keep each key's first-seen row (min ``time_col``,
    then ``tie_break`` columns), same columns as the input."""
    w = Window.partitionBy(*keys).orderBy(time_col, *tie_break)
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
