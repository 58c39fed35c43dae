"""End-to-end pipeline orchestrator (reference src/main.py:21-205).

Runs the reference's five phases — validate config, ingest, feature
engineering + targets, ML dataset preparation, train, evaluate —
as one command::

    python -m marketdatapipeline_spark.main [--fixtures DIR] [--symbols A,B]

Spark-native differences from the reference orchestration:

- ingestion yields ONE DataFrame with a ``symbol`` column (the
  reference loops a ``Dict[str, DataFrame]``; main.py:62-87), so the
  feature phase is a single lazy plan over all symbols — no per-symbol
  driver loop, and the reference's align-and-cast concat
  (main.py:98-125) collapses into the union inside
  ``fetch_multiple_symbols``;
- evaluation metrics are computed distributed (broadcast-model pandas
  UDF inference + Catalyst aggregations), not on driver numpy;
- with no API key (the default in this container) ingestion reads the
  parquet fixtures via a pluggable fetcher, exercising the identical
  cache/save/union path the Alpha Vantage fetcher uses.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import tempfile

from pyspark.sql import SparkSession

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger(__name__)


def fixture_fetcher(sf_dir: str):
    """A ``Fetcher`` that serves per-symbol OHLCV pandas frames from
    the testdata events parquet — the network-free stand-in for the
    Alpha Vantage client, plugged into the same ingestion machinery."""
    import pandas as pd  # noqa: F401 — ensures pandas boundary exists

    def fetch(symbol: str, interval: str, outputsize: str):
        from marketdatapipeline_spark.sources import bars_from_events

        spark = SparkSession.getActiveSession()
        bars = bars_from_events(spark, sf_dir).filter(f"symbol = '{symbol}'")
        pdf = bars.drop("symbol", "bar_id").toPandas()
        if len(pdf) == 0:
            raise ValueError(f"no fixture rows for {symbol}")
        return pdf

    return fetch


def run_pipeline(
    spark: SparkSession,
    config=None,
    fixtures_dir: str | None = None,
    symbols: tuple[str, ...] | None = None,
    work_dir: str | None = None,
    cv_folds: int = 0,
    scale_features: str | None = None,
) -> dict:
    """The five reference phases; returns a summary dict (paths,
    row counts, metrics) for programmatic use and tests.

    ``cv_folds > 0`` additionally runs expanding-window walk-forward
    cross-validation (ml/validation.py) on the featured frame and
    reports per-fold + aggregate metrics under ``cross_validation`` —
    the generalization estimate to trust over the single held-out
    split when comparing hyperparameters.

    ``scale_features`` (``"standardize"`` or ``"winsorize"``) runs
    the leakage-free fit-on-train transform (ml/scaling.py) over the
    feature columns in place between split and fit — a no-op for the
    reference's tree models' ACCURACY but the correct contract for
    any linear/NN consumer of the exported dataset."""
    from marketdatapipeline_spark.config import DEFAULT_CONFIG
    from marketdatapipeline_spark.features import compute_all_features, generate_targets
    from marketdatapipeline_spark.ingestion import fetch_multiple_symbols
    from marketdatapipeline_spark.ml.evaluation import (
        classification_metrics,
        plot_feature_importance,
        regression_metrics,
        roc_auc,
    )
    from marketdatapipeline_spark.ml.preparation import prepare_dataset
    from marketdatapipeline_spark.ml.prediction import predict
    from marketdatapipeline_spark.ml.training import train_model

    cfg = config or DEFAULT_CONFIG
    work_dir = work_dir or tempfile.mkdtemp(prefix="mdp_pipeline_")

    # ---- phase 0: configuration (reference main.py:27-32) ----
    cfg.validate(require_api_key=False)
    logger.info("configuration validated")

    # ---- phase 1: ingestion (reference main.py:34-55) ----
    fetcher = None
    if fixtures_dir is not None:
        fetcher = fixture_fetcher(fixtures_dir)
        # fixture bars bucket user_id % 10 into symbols "0".."9" —
        # mirror the reference's 3-symbol default at that naming
        symbols = tuple(symbols or ("0", "1", "2"))
    elif not cfg.alpha_vantage_api_key:
        raise ValueError(
            "no ALPHAVANTAGE_API_KEY and no --fixtures directory given"
        )
    symbols = tuple(symbols or cfg.default_symbols)
    bars = fetch_multiple_symbols(
        spark,
        symbols,
        interval=cfg.default_interval,
        save=True,
        use_cache=False,
        data_dir=work_dir,
        fetcher=fetcher,
        api_key=cfg.alpha_vantage_api_key,
        pause_seconds=0.0 if fetcher else cfg.rate_limit_sleep_seconds,
    )
    logger.info("ingested %d symbols", len(symbols))

    # ---- phase 2: features + targets (reference main.py:57-91) ----
    featured = generate_targets(
        compute_all_features(
            bars,
            momentum_periods=cfg.momentum_periods,
            volatility_windows=cfg.volatility_windows,
            rsi_period=cfg.rsi_period,
            macd_fast=cfg.macd_fast,
            macd_slow=cfg.macd_slow,
            macd_signal=cfg.macd_signal,
            bb_period=cfg.bb_period,
            bb_std=cfg.bb_std,
        ),
        horizon=cfg.prediction_horizon,
        target_type=cfg.target_type,
    )

    # ---- phase 3: ML dataset (reference main.py:93-140) ----
    # ONE prepare_dataset call serves both consumers: the numpy slice
    # for the driver-side fit (phase 4) and the test DataFrame for the
    # distributed scoring (phase 5). The feature plan is persisted so
    # it executes once — without this, each downstream action replays
    # feature engineering + split from the source frames.
    featured = featured.persist()
    train_df, test_df, feature_names = prepare_dataset(
        featured,
        feature_cols=None,
        target_col="target",
        test_size=cfg.test_size,
        random_state=cfg.random_state,
    )
    if scale_features is not None:
        from marketdatapipeline_spark.ml.scaling import scale_split

        train_df, test_df = scale_split(
            train_df, test_df, list(feature_names), method=scale_features
        )
        logger.info("feature scaling applied: %s", scale_features)
    n_train = train_df.count()
    n_test = test_df.count()
    logger.info(
        "dataset: %d train / %d test rows, %d features",
        n_train, n_test, len(feature_names),
    )

    # ---- phase 4: training (reference main.py:142-170) ----
    hyper = {
        "n_estimators": cfg.n_estimators,
        "max_depth": cfg.max_depth,
        "learning_rate": cfg.learning_rate,
        "subsample": cfg.subsample,
        "colsample_bytree": cfg.colsample_bytree,
    }
    is_cls = cfg.target_type == "classification"
    use_distributed = n_train > cfg.distributed_train_threshold
    if use_distributed:
        # Scale path (SURVEY §2.5 M2): no driver collect — the fit runs
        # as Spark jobs (xgboost.spark when importable, pyspark.ml GBT
        # otherwise). Reference-exact single-node fit stays the default
        # below the threshold.
        from marketdatapipeline_spark.ml.distributed import (
            train_model_distributed,
        )

        model_path = os.path.join(
            work_dir, f"dist_{cfg.target_type}_{cfg.prediction_horizon}"
        )
        model = train_model_distributed(
            train_df,
            feature_names,
            target_col="target",
            model_type=cfg.target_type,
            hyperparameters=hyper,
        )
        model.save(model_path)
        can_proba = is_cls
        scored = model.transform(test_df)
    else:
        train_pdf = train_df.toPandas()
        X_train = train_pdf[feature_names].to_numpy("float64")
        y_train = train_pdf["target"].to_numpy("float64")
        model_path = os.path.join(
            work_dir, f"xgboost_{cfg.target_type}_{cfg.prediction_horizon}.pkl"
        )
        model = train_model(
            X_train,
            y_train,
            model_type=cfg.target_type,
            hyperparameters=hyper,
            save_path=model_path,
        )
        can_proba = is_cls and hasattr(model, "predict_proba")
    logger.info(
        "model saved: %s (distributed=%s)", model_path, use_distributed
    )

    # ---- phase 5: evaluation (reference main.py:172-199) ----
    # Distributed either way: the broadcast-model UDF (driver-fit) or
    # the pipeline transform (distributed fit) scores the test slice,
    # and metrics aggregate in Spark (the reference predicts on driver
    # numpy; semantics identical, this path survives a big test set).
    if not use_distributed:
        scored = predict(model, test_df, feature_names, return_proba=can_proba)
    metric_fn = classification_metrics if is_cls else regression_metrics
    metrics = metric_fn(scored.withColumn(
        "prediction", scored["prediction"].cast("double")
    )).collect()[0].asDict()
    if can_proba:
        # Distributed rank-statistic AUC (the reference publishes
        # ROC-AUC for its classifier, model_training.ipynb cell 11).
        # Probabilities are quantized to 1e-6 so the distinct-score
        # table stays tiny at any test-set size (see roc_auc docstring).
        from pyspark.sql import functions as F

        metrics["roc_auc"] = roc_auc(
            scored.withColumn("probability", F.round("probability", 6)),
            label_col="target",
            score_col="probability",
        ).first()[0]
    logger.info("metrics: %s", metrics)

    plot_path = plot_feature_importance(
        model, feature_names, top_n=20,
        save_path=os.path.join(work_dir, "feature_importance.png"),
    )

    # ---- optional: walk-forward CV (no reference counterpart) ----
    cv = None
    if cv_folds > 0:
        from marketdatapipeline_spark.ml.validation import cross_validate

        cv = cross_validate(
            featured,
            n_folds=cv_folds,
            feature_cols=feature_names,
            target_col="target",
            model_type=cfg.target_type,
            hyperparameters=hyper,
        )
        logger.info("walk-forward CV aggregate: %s", cv["aggregate"])
    featured.unpersist()

    summary = {
        "work_dir": work_dir,
        "model_path": model_path,
        "plot_path": plot_path,
        "n_train": int(n_train),
        "n_test": int(n_test),
        "n_features": len(feature_names),
        "metrics": {k: float(v) for k, v in metrics.items()},
    }
    if scale_features is not None:
        summary["feature_scaling"] = scale_features
    if cv is not None:
        summary["cross_validation"] = cv
    return summary


def main(argv: list[str] | None = None) -> None:
    from marketdatapipeline_spark.session import get_spark

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--fixtures",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="parquet fixture dir (network-free ingestion); pass empty "
        "string to require a live ALPHAVANTAGE_API_KEY",
    )
    parser.add_argument("--symbols", default=None, help="comma-separated symbols")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument(
        "--cv-folds",
        type=int,
        default=0,
        help="run expanding-window walk-forward CV with this many folds "
        "and report per-fold + aggregate metrics (0 = off)",
    )
    parser.add_argument(
        "--scale",
        choices=("standardize", "winsorize"),
        default=None,
        help="leakage-free feature scaling fitted on the train slice "
        "(ml/scaling.py), applied in place before the fit",
    )
    args = parser.parse_args(argv)

    spark = get_spark(app_name="mdp-pipeline")
    symbols = tuple(args.symbols.split(",")) if args.symbols else None
    summary = run_pipeline(
        spark,
        fixtures_dir=args.fixtures or None,
        symbols=symbols,
        work_dir=args.work_dir,
        cv_folds=args.cv_folds,
        scale_features=args.scale,
    )
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
