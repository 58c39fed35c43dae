"""End-to-end orchestrator smoke (reference src/main.py:21-205):
validate -> ingest (fixture fetcher) -> features -> prepare -> train ->
evaluate -> persist, one call, no network."""

from __future__ import annotations

import os

from marketdatapipeline_spark.main import run_pipeline


def test_run_pipeline_end_to_end(spark, tmp_path):
    summary = run_pipeline(
        spark,
        fixtures_dir="/root/testdata/sf0.001",
        symbols=("0", "1"),
        work_dir=str(tmp_path),
        cv_folds=2,
    )
    assert summary["n_train"] > 0 and summary["n_test"] > 0
    # walk-forward CV reported: per-fold + aggregate metric blocks
    cv = summary["cross_validation"]
    assert [f["fold"] for f in cv["folds"]] == [1, 2]
    assert all(f["n_train"] > 0 and f["n_val"] > 0 for f in cv["folds"])
    assert cv["folds"][1]["n_train"] > cv["folds"][0]["n_train"]  # expanding
    assert 0.0 <= cv["aggregate"]["accuracy"] <= 1.0
    assert summary["n_features"] > 40
    assert os.path.exists(summary["model_path"])
    # the documented artifact: PNG with matplotlib, SVG fallback without
    assert summary["plot_path"] and os.path.exists(summary["plot_path"])
    m = summary["metrics"]
    assert set(m) >= {"accuracy", "precision", "recall", "f1", "roc_auc"}
    assert 0.0 <= m["accuracy"] <= 1.0
    assert 0.0 <= m["roc_auc"] <= 1.0
    # raw parquet for each symbol landed in the work dir (S7/S11 path)
    raw = [p for p, _, fs in os.walk(tmp_path) for f in fs if f.endswith(".parquet")]
    assert raw


def test_run_pipeline_fetches_each_symbol_once(spark, tmp_path, monkeypatch):
    """The pipeline must not replay ingestion: with the feature plan
    persisted and a single prepare_dataset call, the fetcher runs
    exactly once per symbol across ALL downstream actions (train
    export, test count, distributed scoring)."""
    import marketdatapipeline_spark.main as main_mod

    calls: list[str] = []
    real_factory = main_mod.fixture_fetcher

    def spying_factory(sf_dir):
        real = real_factory(sf_dir)

        def fetch(symbol, interval, outputsize):
            calls.append(symbol)
            return real(symbol, interval, outputsize)

        return fetch

    monkeypatch.setattr(main_mod, "fixture_fetcher", spying_factory)
    summary = run_pipeline(
        spark,
        fixtures_dir="/root/testdata/sf0.001",
        symbols=("0", "1"),
        work_dir=str(tmp_path),
    )
    assert summary["n_train"] > 0
    assert sorted(calls) == ["0", "1"]


def test_pipeline_with_feature_scaling(spark, tmp_path):
    """--scale standardize: the pipeline trains on z-scored features,
    reports the flag, and still produces finite metrics."""
    from marketdatapipeline_spark.main import run_pipeline

    summary = run_pipeline(
        spark,
        fixtures_dir="/root/testdata/sf0.001",
        symbols=("0", "1"),
        work_dir=str(tmp_path / "scaled"),
        scale_features="standardize",
    )
    assert summary["feature_scaling"] == "standardize"
    assert summary["n_train"] > 0 and summary["n_test"] > 0
    for v in summary["metrics"].values():
        assert v == v  # finite, not NaN
