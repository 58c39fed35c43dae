"""Model evaluation as DataFrame aggregations (reference
src/ml/evaluation.py:25-82).

The reference computes sklearn metrics on numpy arrays; every one of
those metrics is a closed-form aggregate over (label, prediction)
pairs, so here they are Catalyst aggregations — shuffle-light (one
partial-aggregated exchange), exact, and DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from pyspark.sql import DataFrame, Window
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


def roc_auc(
    df: DataFrame,
    label_col: str = "target",
    score_col: str = "score",
    size_hint: int | None = None,
) -> DataFrame:
    """Distributed ROC-AUC via the Mann-Whitney rank statistic
    (the metric the reference publishes for its classifier,
    model_training.ipynb cell 11).

    AUC = (R_pos - P(P+1)/2) / (P*N) where R_pos is the sum of
    tie-averaged ranks of the positive rows. Computed without ever
    ranking individual rows: one aggregation collapses the data to one
    row per DISTINCT score (n rows, n_pos positives), then a prefix-sum
    window over that (much smaller) table yields every tie-averaged
    rank. All rank arithmetic is integer — doubling the average-rank
    term to ``2*cum_before + n + 1`` keeps it in exact int64 — so the
    single final division is the only float op and the result is
    bit-identical across engines.

    Scale note (r10): the prefix counts over the distinct-score table
    use the DISTRIBUTED running sum (operators/ranking.py — range-
    partitioned cumulative + exact integer offsets), so even a
    continuous score with one distinct value per row never funnels
    through a single task; the aggregation itself is fully
    distributed with map-side partials.

    Small route (r12): at or below the ranking operator's single-task
    threshold the distinct-score groupBy buys nothing (a continuous
    score keeps one row per input row — the r11 measurement showed
    the shuffle + cumsum machinery dominating the sf0.1 timing), so
    the whole statistic computes inside ONE ordered window pass: two
    range frames over the same sort give the tie-inclusive and
    tie-peer counts, and ``2*avg_rank = 2*cnt_le - cnt_eq + 1`` stays
    in exact int64. Same integers, same single float division —
    value-identical to the distributed route (parity-pinned).
    """
    from marketdatapipeline_spark.operators import ranking
    from marketdatapipeline_spark.operators.ranking import global_row_number

    y = F.col(label_col).cast("long")
    s = F.col(score_col).cast("double")
    if (
        size_hint is not None
        and size_hint <= ranking.SINGLE_TASK_THRESHOLD
    ):
        wo = Window.orderBy("_s")
        cnt_le = F.count(F.lit(1)).over(
            wo.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cnt_eq = F.count(F.lit(1)).over(
            wo.rangeBetween(Window.currentRow, Window.currentRow)
        )
        per = df.select(s.alias("_s"), y.alias("_y")).select(
            "_y", (2 * cnt_le - cnt_eq + 1).alias("_2r")
        )
        agg = per.agg(
            F.sum(F.when(F.col("_y") == 1, F.col("_2r"))).alias("_r2"),
            F.sum("_y").alias("_p"),
            F.sum(1 - F.col("_y")).alias("_neg"),
        )
        return _auc_from_doubled_ranksum(agg)
    g = (
        df.select(s.alias("_s"), y.alias("_y"))
        .groupBy("_s")
        .agg(F.count("*").alias("_n"), F.sum("_y").alias("_np"))
    )
    # exclusive-preceding count = inclusive running count - own count
    # size_hint (r11): an input-row upper bound on the distinct-score
    # table skips the operator's persist+count probe (routing only)
    ranked = global_row_number(
        g, F.col("_s"), out_col="_gr", cumsum={"_ci": "_n"},
        size_hint=size_hint,
    ).withColumn("_cb", F.col("_ci") - F.col("_n"))
    agg = ranked.agg(
        F.sum(
            F.col("_np") * (2 * F.col("_cb") + F.col("_n") + 1)
        ).alias("_r2"),
        F.sum("_np").alias("_p"),
        F.sum(F.col("_n") - F.col("_np")).alias("_neg"),
    )
    return _auc_from_doubled_ranksum(agg)


def _auc_from_doubled_ranksum(agg: DataFrame) -> DataFrame:
    """AUC from the shared 1-row aggregate ``(_r2, _p, _neg)`` where
    ``_r2`` is the doubled tie-averaged rank sum of the positives —
    both roc_auc routes reduce to exactly these integers."""
    p, neg = F.col("_p"), F.col("_neg")
    # Single-class input (p or neg = 0) makes the divisor 0: return
    # 0.0 instead of NULL, matching _roc_auc_np's convention (a NULL
    # here would blow up callers that float()-cast the metrics dict).
    # coalesce: on EMPTY input the sums are NULL (not 0), and
    # NULL == 0 is NULL, which would fall through to the NULL
    # otherwise-branch — the exact crash the guard exists to prevent.
    return agg.select(
        F.when(F.coalesce(p * neg, F.lit(0)) == 0, F.lit(0.0))
        .otherwise(
            (F.col("_r2") - p * (p + 1)).cast("double")
            / (2.0 * (p * neg).cast("double"))
        )
        .alias("roc_auc")
    )


def _roc_auc_np(y_true: np.ndarray, scores: np.ndarray) -> float:
    """Driver-side ROC-AUC, tie-averaged ranks — the same Mann-Whitney
    statistic :func:`roc_auc` computes distributed."""
    y = np.asarray(y_true).astype(np.int64)
    s = np.asarray(scores).astype(np.float64)
    order = np.argsort(s, kind="mergesort")
    ss = s[order]
    ranks = np.empty(len(ss), dtype=np.float64)
    i = 0
    while i < len(ss):
        j = i
        while j + 1 < len(ss) and ss[j + 1] == ss[i]:
            j += 1
        ranks[i : j + 1] = (i + j) / 2.0 + 1.0  # average of 1-based ranks
        i = j + 1
    r = np.empty(len(ss), dtype=np.float64)
    r[order] = ranks
    p = int((y == 1).sum())
    n = int((y == 0).sum())
    if p == 0 or n == 0:
        return 0.0
    return float((r[y == 1].sum() - p * (p + 1) / 2.0) / (p * n))


def _binary_counts(y_true: np.ndarray, y_pred: np.ndarray, pos: int):
    tp = int(((y_true == pos) & (y_pred == pos)).sum())
    fp = int(((y_true != pos) & (y_pred == pos)).sum())
    fn = int(((y_true == pos) & (y_pred != pos)).sum())
    return tp, fp, fn


def _prf(tp: int, fp: int, fn: int) -> tuple[float, float, float]:
    """precision/recall/f1 with sklearn's zero_division=0 convention."""
    precision = tp / (tp + fp) if tp + fp > 0 else 0.0
    recall = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return precision, recall, f1


def classification_report_dict(y_true, y_pred) -> dict:
    """Per-class precision/recall/f1/support plus accuracy and
    macro/weighted averages — the dict form of the
    ``classification_report`` the reference logs
    (reference src/ml/evaluation.py:63, sklearn ``output_dict=True``
    shape: class labels as string keys)."""
    y_t = np.asarray(y_true).astype(np.int64)
    y_p = np.asarray(y_pred).astype(np.int64)
    labels = sorted(set(y_t.tolist()) | set(y_p.tolist()))
    report: dict = {}
    rows = []
    for lab in labels:
        tp, fp, fn = _binary_counts(y_t, y_p, lab)
        precision, recall, f1 = _prf(tp, fp, fn)
        support = int((y_t == lab).sum())
        report[str(lab)] = {
            "precision": precision,
            "recall": recall,
            "f1-score": f1,
            "support": support,
        }
        rows.append((precision, recall, f1, support))
    total = len(y_t)
    report["accuracy"] = float((y_t == y_p).sum() / total) if total else 0.0
    if rows:
        report["macro avg"] = {
            "precision": sum(r[0] for r in rows) / len(rows),
            "recall": sum(r[1] for r in rows) / len(rows),
            "f1-score": sum(r[2] for r in rows) / len(rows),
            "support": total,
        }
        report["weighted avg"] = {
            "precision": sum(r[0] * r[3] for r in rows) / total,
            "recall": sum(r[1] * r[3] for r in rows) / total,
            "f1-score": sum(r[2] * r[3] for r in rows) / total,
            "support": total,
        }
    return report


def evaluate_model(
    model,
    X_test: np.ndarray,
    y_test: np.ndarray,
    model_type: str = "classification",
) -> dict:
    """API-parity wrapper (reference src/ml/evaluation.py:25-82):
    numpy test slice in, metrics dict out, same keys as the reference
    (accuracy/precision/recall/f1/confusion_matrix for classification,
    mse/rmse/mae/r2 for regression).

    Additions over the reference's dict: ``classification_report``
    (the per-class report the reference only logs) and ``roc_auc``
    (published in the reference's results, model_training.ipynb cell
    11) when the model exposes ``predict_proba``.

    Driver-side by contract — the test slice is already a numpy
    array; the distributed equivalents are
    :func:`classification_metrics` / :func:`regression_metrics` /
    :func:`roc_auc` over a predictions DataFrame.
    """
    y_pred = np.asarray(model.predict(X_test))

    if model_type == "classification":
        y_t = np.asarray(y_test).astype(np.int64)
        y_p = y_pred.astype(np.int64)
        tp, fp, fn = _binary_counts(y_t, y_p, 1)
        tn = int(((y_t == 0) & (y_p == 0)).sum())
        precision, recall, f1 = _prf(tp, fp, fn)
        metrics = {
            "accuracy": float((y_t == y_p).sum() / len(y_t)) if len(y_t) else 0.0,
            "precision": precision,
            "recall": recall,
            "f1": f1,
            # sklearn row/col order: true x predicted, labels [0, 1]
            "confusion_matrix": [[tn, fp], [fn, tp]],
            "classification_report": classification_report_dict(y_t, y_p),
        }
        if hasattr(model, "predict_proba"):
            proba = np.asarray(model.predict_proba(X_test))[:, 1]
            metrics["roc_auc"] = _roc_auc_np(y_t, proba)
        return metrics

    if model_type == "regression":
        y_t = np.asarray(y_test).astype(np.float64)
        y_p = y_pred.astype(np.float64)
        err = y_t - y_p
        mse = float(np.mean(err * err))
        ss_tot = float(np.sum((y_t - y_t.mean()) ** 2))
        return {
            "mse": mse,
            "rmse": float(np.sqrt(mse)),
            "mae": float(np.mean(np.abs(err))),
            "r2": float(1.0 - np.sum(err * err) / ss_tot) if ss_tot else 0.0,
        }

    raise ValueError(f"Unsupported model type: {model_type}")


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
