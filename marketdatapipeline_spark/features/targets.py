"""ML target generation (reference src/features/targets.py:7-45)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def generate_targets(
    df: DataFrame,
    horizon: int = 1,
    target_type: str = "classification",
    datetime_col: str = "datetime",
    close_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Add a ``target`` column and drop rows where it is NULL.

    forward_return = (lead(close, horizon) - close) / close; target is
    ``(forward_return > 0)::tinyint`` for classification or the return
    itself for regression (reference targets.py:30-39). The NULL filter
    drops each symbol's last ``horizon`` rows (lead is NULL there; a
    NULL comparison casts to NULL, so both modes drop identically —
    reference targets.py:43). A zero/NaN close yields a NaN forward
    return, which Spark's isNotNull treats as a valid float and KEEPS
    — matching Polars' is_not_null (NaN is not null in either engine).
    """
    if close_col not in df.columns:
        raise ValueError(f"The '{close_col}' column is required")
    order_cols = tuple(order_cols or (datetime_col,))
    w = Window.partitionBy(symbol_col).orderBy(*[F.col(c) for c in order_cols])
    close = F.col(close_col)
    forward_return = (F.lead(close, horizon).over(w) - close) / close
    if target_type == "classification":
        target = (forward_return > 0).cast("tinyint")
    elif target_type == "regression":
        target = forward_return
    else:
        raise ValueError(f"Unsupported target type: {target_type}")
    return df.withColumn("target", target).filter(F.col("target").isNotNull())
