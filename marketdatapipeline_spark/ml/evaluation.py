"""Model evaluation as DataFrame aggregations (reference
src/ml/evaluation.py:25-82).

The reference computes sklearn metrics on numpy arrays; every one of
those metrics is a closed-form aggregate over (label, prediction)
pairs, so here they are Catalyst aggregations — shuffle-light (one
partial-aggregated exchange), exact, and DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pathlib import Path

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


def plot_feature_importance(
    model,
    feature_names: list[str],
    top_n: int = 20,
    save_path: str | None = None,
) -> str | None:
    """Render the top-N feature-importance bar chart (M5, reference
    src/ml/evaluation.py:85-130: seaborn barplot saved as PNG).

    Driver-side and tiny (top_n rows). With matplotlib installed this
    writes the PNG the reference writes; without it (this container
    ships no plotting libs) it falls back to a dependency-free SVG of
    the same horizontal bar chart so the pipeline still produces the
    documented artifact. Returns the written path (extension may be
    corrected to .svg in the fallback), or None when ``save_path`` is
    None and matplotlib is absent (nothing to show a display on).
    """
    ranked = sorted(
        zip(feature_names, (float(v) for v in model.feature_importances_)),
        key=lambda t: (-t[1], t[0]),
    )[:top_n]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        if save_path is None:
            return None
        path = str(Path(save_path).with_suffix(".svg"))
        width, bar_h, left = 640, 22, 220
        height = bar_h * len(ranked) + 60
        vmax = max((v for _, v in ranked), default=1.0) or 1.0
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
            f'<text x="10" y="24" font-size="16">Top {len(ranked)} Features par Importance</text>',
        ]
        for i, (name, val) in enumerate(ranked):
            y = 40 + i * bar_h
            w = (width - left - 20) * val / vmax
            parts.append(
                f'<text x="{left - 8}" y="{y + 15}" font-size="11" text-anchor="end">{name}</text>'
                f'<rect x="{left}" y="{y + 3}" width="{w:.1f}" height="{bar_h - 6}" fill="#4472c4"/>'
                f'<text x="{left + w + 4:.1f}" y="{y + 15}" font-size="10">{val:.4f}</text>'
            )
        parts.append("</svg>")
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text("\n".join(parts))
        return path

    names = [n for n, _ in ranked][::-1]
    vals = [v for _, v in ranked][::-1]
    plt.figure(figsize=(10, 8))
    plt.barh(names, vals)
    plt.title(f"Top {len(ranked)} Features par Importance")
    plt.xlabel("Importance")
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=300, bbox_inches="tight")
        plt.close()
        return save_path
    plt.show()
    plt.close()
    return None
