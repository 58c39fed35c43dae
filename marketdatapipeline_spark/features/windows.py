"""Rolling-window helpers with Polars ``min_periods`` semantics.

The reference's rolling aggregates (Polars ``rolling_mean/std/sum``,
e.g. reference src/features/engineering.py:59-60, 109, 144, 148) emit
NULL until the window holds ``window_size`` non-null values
(``min_periods`` defaults to the window size). Spark's
``agg().over(rowsBetween(-(n-1), 0))`` emits partial aggregates from
the first row instead, so every rolling helper here masks rows whose
frame holds fewer than ``n`` non-null values (SURVEY.md trap T1).

All helpers take a base ``WindowSpec`` already partitioned by symbol
and ordered by event time; they derive the row-frame themselves.
At scale this partitioning means ONE hash exchange on ``symbol``
shared by every window column in the stage — Catalyst collapses
identical WindowSpecs into a single physical Window node.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def rows_frame(w: WindowSpec, n: int) -> WindowSpec:
    """Trailing frame of ``n`` rows ending at the current row."""
    return w.rowsBetween(-(n - 1), 0)


def _masked(col: Column, n: int, frame: WindowSpec, agg: Column) -> Column:
    """NULL unless the frame holds >= n non-null values (trap T1).

    ``F.count`` counts non-nulls, which matches Polars' definition of
    ``min_periods`` (number of valid values before emitting).
    """
    return F.when(F.count(col).over(frame) >= n, agg)


def rolling_mean(col: Column, n: int, w: WindowSpec) -> Column:
    f = rows_frame(w, n)
    return _masked(col, n, f, F.avg(col).over(f))


def rolling_std(col: Column, n: int, w: WindowSpec) -> Column:
    """Sample standard deviation (ddof=1), matching Polars' default."""
    f = rows_frame(w, n)
    return _masked(col, n, f, F.stddev_samp(col).over(f))


def rolling_sum(col: Column, n: int, w: WindowSpec) -> Column:
    f = rows_frame(w, n)
    return _masked(col, n, f, F.sum(col).over(f))
