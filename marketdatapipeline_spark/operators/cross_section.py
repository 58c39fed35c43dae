"""Cross-sectional normalization — rank / z-score / demean a value
against its contemporaneous peers (everything in the same time
bucket), the transform factor models apply before any signal is
comparable across instruments.

Plan shape: one window exchange on the bucket key serves every
output (count, decimal-exact sum and sum-of-squares, rank share the
same partitioning; rank adds an in-partition sort, no extra
exchange). Buckets hold one cross-section each — cardinality scales
with the time span, so partitions stay small and uniform at any data
volume; no broadcast, no join.

Cross-engine exactness: the cross-sectional mean/std derive from
``decimal(28,10)`` sums of the value and its square (the square is an
IEEE multiply — correctly rounded in every engine — so the decimal
quantization is identical everywhere), making the sums
association-free; the remaining scalar double arithmetic is ordered
identically in any engine, so round-6 compares are boundary-proof —
the operators/vwap.py convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cross_sectional"]

_BUCKETS = {"hour": "hour", "day": "dd", "minute": "minute"}


def cross_sectional(
    df: DataFrame,
    value_col: str = "close",
    bucket: str = "hour",
    time_col: str = "datetime",
    value_decimals: int | None = None,
) -> DataFrame:
    """Add per-bucket cross-sectional columns for ``value_col``:

    - ``cs_n``     — peers in the bucket (bucket size)
    - ``cs_rank``  — ``rank()`` ascending (ties share a rank)
    - ``cs_mean``  — bucket mean
    - ``cs_demean``— value minus bucket mean
    - ``cs_zscore``— (value - mean) / sample std (ddof=1); null when
      the bucket has one row or zero variance

    Null values are excluded from ``cs_n``/mean/std (matching the
    null-skipping sums) and receive a null ``cs_rank``; non-null rows
    rank with nulls sorted last, so ranks match any engine's
    NULLS LAST convention.

    ``value_decimals=d`` declares the value column decimal-quantized
    to ``d`` places (prices usually are): sums then accumulate over
    ``round(x·10^d)`` longs — EXACT integer arithmetic, so any engine
    agrees bit-for-bit (double→decimal casts tie-break differently
    across engines when the double's ulp nears the decimal quantum —
    observed on close² at decimal(28,10)). Default (None) keeps
    decimal(28,10) accumulation for non-quantized data: still
    association-free, with only the (rare) cast-tie caveat.
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    key = F.date_trunc(_BUCKETS[bucket], F.col(time_col))
    w = Window.partitionBy(key)
    # nulls sort LAST explicitly: Spark's ascending default is
    # NULLS FIRST, DuckDB's is NULLS LAST — pinning the order keeps
    # non-null ranks engine-independent when values are missing
    w_rank = w.orderBy(F.col(value_col).asc_nulls_last())

    x = F.col(value_col)
    # count NON-NULL values: the sums skip nulls, so a row-count n
    # would skew mean/var on buckets with missing values
    n = F.count(x).over(w)
    if value_decimals is not None:
        s1 = float(10**value_decimals)
        s2 = float(10 ** (2 * value_decimals))
        sx = (
            F.sum(F.round(x * F.lit(s1)).cast("long")).over(w).cast("double")
            / F.lit(s1)
        )
        sxx = (
            F.sum(F.round(x * x * F.lit(s2)).cast("long"))
            .over(w)
            .cast("double")
            / F.lit(s2)
        )
    else:
        sx = F.sum(x.cast("decimal(28,10)")).over(w).cast("double")
        sxx = F.sum((x * x).cast("decimal(28,10)")).over(w).cast("double")
    mean = sx / n
    # sample variance from exact sums: (sxx - sx^2/n) / (n-1)
    var: Column = (sxx - sx * sx / n) / (n - F.lit(1))
    std = F.sqrt(var)
    return df.withColumns(
        {
            "cs_n": n,
            "cs_rank": F.when(x.isNotNull(), F.rank().over(w_rank)),
            "cs_mean": mean,
            "cs_demean": x - mean,
            "cs_zscore": F.when(
                (n > 1) & (var > 0), (x - mean) / std
            ),
        }
    )
