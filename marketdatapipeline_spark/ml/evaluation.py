"""Model evaluation as DataFrame aggregations (reference
src/ml/evaluation.py:25-82).

The reference computes sklearn metrics on numpy arrays; every one of
those metrics is a closed-form aggregate over (label, prediction)
pairs, so here they are Catalyst aggregations — shuffle-light (one
partial-aggregated exchange), exact, and DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str = "target", pred_col: str = "prediction"
) -> DataFrame:
    """groupBy(label, prediction).count() (reference evaluation.py:56)."""
    return df.groupBy(label_col, pred_col).agg(F.count("*").alias("n"))


def classification_metrics(
    df: DataFrame, label_col: str = "target", pred_col: str = "prediction"
) -> DataFrame:
    """accuracy / precision / recall / F1 with sklearn's
    ``zero_division=0`` convention (reference evaluation.py:44-52).

    One aggregation pass: tp/fp/fn/tn as conditional counts, metrics
    derived in the projection.
    """
    label = F.col(label_col).cast("int")
    pred = F.col(pred_col).cast("int")
    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(((label == 1) & (pred == 1)).cast("long")).alias("tp"),
        F.sum(((label == 0) & (pred == 1)).cast("long")).alias("fp"),
        F.sum(((label == 1) & (pred == 0)).cast("long")).alias("fn"),
        F.sum(((label == 0) & (pred == 0)).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(
        (tp + fp > 0) & (tp + fn > 0) & (tp > 0),
        2.0 * (tp / (tp + fp)) * (tp / (tp + fn))
        / ((tp / (tp + fp)) + (tp / (tp + fn))),
    ).otherwise(F.lit(0.0))
    return agg.select(
        ((tp + tn) / F.col("n")).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        "tp", "fp", "fn", "tn",
    )


def regression_metrics(
    df: DataFrame, label_col: str = "target", pred_col: str = "prediction"
) -> DataFrame:
    """MSE / RMSE / MAE / R2 (reference evaluation.py:65-77)."""
    y = F.col(label_col).cast("double")
    p = F.col(pred_col).cast("double")
    err = y - p
    agg = df.agg(
        F.avg(err * err).alias("mse"),
        F.avg(F.abs(err)).alias("mae"),
        F.sum(err * err).alias("ss_res"),
        F.sum(y * y).alias("sum_y2"),
        F.sum(y).alias("sum_y"),
        F.count("*").alias("n"),
    )
    ss_tot = F.col("sum_y2") - F.col("sum_y") * F.col("sum_y") / F.col("n")
    return agg.select(
        "mse",
        F.sqrt(F.col("mse")).alias("rmse"),
        "mae",
        (F.lit(1.0) - F.col("ss_res") / ss_tot).alias("r2"),
    )


def feature_importance_top_k(
    spark, model, feature_names: list[str], top_n: int = 20
) -> DataFrame:
    """Top-k features by importance (M5, reference evaluation.py:85-111):
    sort desc + limit — a TakeOrdered, no global sort."""
    imp = [float(v) for v in model.feature_importances_]
    rows = list(zip(feature_names, imp))
    df = spark.createDataFrame(rows, ["feature", "importance"])
    return df.orderBy(F.desc("importance"), "feature").limit(top_n)
