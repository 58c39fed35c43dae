"""ML layer: prep, split, train (fallback model), metrics, inference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from marketdatapipeline_spark.features import compute_all_features
from marketdatapipeline_spark.ml import (
    chronological_split,
    classification_metrics,
    classification_report_dict,
    confusion_matrix,
    evaluate_model,
    feature_columns,
    feature_importance_top_k,
    load_model,
    predict,
    prepare_dataset,
    regression_metrics,
    roc_auc,
    save_model,
    train_model,
)


@pytest.fixture(scope="module")
def featured(spark, bars_df):
    return compute_all_features(bars_df, target_horizon=1).cache()


def test_feature_columns_exclusion(featured):
    cols = feature_columns(featured)
    assert "target" not in cols and "close" not in cols and "symbol" not in cols
    assert "rsi" in cols and "sma_20" in cols
    assert len(cols) == 49  # reference: 49 features (SURVEY.md §2.8)


def test_chronological_split_is_ordered(spark, featured):
    train, test = chronological_split(featured, test_size=0.2)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == featured.count()
    assert abs(n_train - 0.8 * featured.count()) <= 1
    assert (
        train.agg(F.max("datetime")).first()[0]
        <= test.agg(F.min("datetime")).first()[0]
    )


def test_chronological_split_cutkey_matches_rownumber(spark):
    """The distributed cut-key path must reproduce the row_number cut
    exactly — counts AND membership — including boundary-timestamp
    ties split by the deterministic tie-break."""
    import pandas as pd

    n = 1000
    pdf = pd.DataFrame(
        {
            # 4 rows per timestamp -> the 80% boundary lands inside a tie group
            "datetime": pd.date_range("2024-01-01", periods=n // 4, freq="1min").repeat(4),
            "bar_id": range(n),
            "x": [i * 0.5 for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf)
    for ts in (0.2, 0.25, 0.301):
        a_train, a_test = chronological_split(
            df, test_size=ts, order_cols=("datetime",), method="rownumber"
        )
        b_train, b_test = chronological_split(
            df, test_size=ts, order_cols=("datetime",), method="cutkey"
        )
        assert a_train.count() == b_train.count() == int((1 - ts) * n)
        assert a_test.count() == b_test.count()
        a_ids = {r.bar_id for r in a_train.select("bar_id").collect()}
        b_ids = {r.bar_id for r in b_train.select("bar_id").collect()}
        assert a_ids == b_ids, f"membership diverged at test_size={ts}"


def test_chronological_split_cutkey_timestamp_ntz(spark):
    """The boundary-literal cast must handle TIMESTAMP_NTZ order
    columns (the parquet default) — a plain datetime literal resolves
    as TIMESTAMP and the struct comparison would fail or miscompare.
    Also exercises case-insensitive order_cols resolution."""
    import pandas as pd

    n = 400
    pdf = pd.DataFrame(
        {
            "datetime": pd.date_range("2024-01-01", periods=n // 4, freq="1min").repeat(4),
            "bar_id": range(n),
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "datetime", F.col("datetime").cast("timestamp_ntz")
    )
    a_train, a_test = chronological_split(
        df, test_size=0.25, order_cols=("datetime",), method="rownumber"
    )
    b_train, b_test = chronological_split(
        df, test_size=0.25, order_cols=("DateTime",), method="cutkey"
    )
    assert a_train.count() == b_train.count() == 300
    a_ids = {r.bar_id for r in a_train.select("bar_id").collect()}
    b_ids = {r.bar_id for r in b_train.select("bar_id").collect()}
    assert a_ids == b_ids


def test_prepare_dataset_numpy_contract(featured):
    X_train, X_test, y_train, y_test, names = prepare_dataset(featured, as_numpy=True)
    assert X_train.shape[1] == len(names) == 49
    assert X_train.shape[0] == y_train.shape[0]
    assert not np.isnan(X_train).any()  # drop_nulls removed warmup rows


def test_train_evaluate_predict_roundtrip(spark, featured, tmp_path):
    train, test, names = prepare_dataset(featured)
    pdf = train.toPandas()
    model = train_model(
        pdf[names].to_numpy("float64"),
        pdf["target"].to_numpy("float64"),
        save_path=str(tmp_path / "m.pkl"),
    )
    scored = predict(model, test, names, return_proba=True)
    assert "prediction" in scored.columns and "probability" in scored.columns
    m = classification_metrics(scored).first()
    assert 0.0 <= m.accuracy <= 1.0 and 0.0 <= m.f1 <= 1.0
    cm = confusion_matrix(scored)
    assert cm.agg(F.sum("n")).first()[0] == test.count()
    # persistence roundtrip
    back = load_model(str(tmp_path / "m.pkl"))
    p1 = model.predict(pdf[names].to_numpy("float64")[:5])
    p2 = back.predict(pdf[names].to_numpy("float64")[:5])
    assert (p1 == p2).all()
    # importance top-k
    top = feature_importance_top_k(spark, model, names, top_n=5)
    assert top.count() == 5


def test_regression_metrics_known_values(spark):
    rows = [(1.0, 1.5), (2.0, 1.5), (3.0, 3.5), (4.0, 3.5)]
    df = spark.createDataFrame(rows, ["target", "prediction"])
    m = regression_metrics(df).first()
    assert abs(m.mse - 0.25) < 1e-12
    assert abs(m.rmse - 0.5) < 1e-12
    assert abs(m.mae - 0.5) < 1e-12
    # r2 = 1 - ss_res/ss_tot = 1 - 1.0/5.0
    assert abs(m.r2 - 0.8) < 1e-12


def test_classification_metrics_zero_division(spark):
    # all-negative predictions: precision undefined -> 0 (sklearn convention)
    rows = [(1, 0), (0, 0), (1, 0)]
    df = spark.createDataFrame(rows, ["target", "prediction"])
    m = classification_metrics(df).first()
    assert m.precision == 0.0 and m.recall == 0.0 and m.f1 == 0.0
    assert abs(m.accuracy - 1 / 3) < 1e-12


def test_evaluate_model_classification(featured):
    """API-parity chain (reference src/ml/evaluation.py:25-63):
    prepare -> train -> evaluate_model returns the reference's dict."""
    X_train, X_test, y_train, y_test, names = prepare_dataset(featured, as_numpy=True)
    model = train_model(X_train, y_train, model_type="classification")
    m = evaluate_model(model, X_test, y_test, model_type="classification")
    for key in ("accuracy", "precision", "recall", "f1"):
        assert 0.0 <= m[key] <= 1.0
    cm = m["confusion_matrix"]
    assert len(cm) == 2 and sum(sum(r) for r in cm) == len(y_test)
    # accuracy consistent with the confusion matrix it ships
    assert abs(m["accuracy"] - (cm[0][0] + cm[1][1]) / len(y_test)) < 1e-12
    rep = m["classification_report"]
    assert rep["accuracy"] == m["accuracy"]
    assert rep["1"]["precision"] == m["precision"]
    assert rep["macro avg"]["support"] == len(y_test)
    assert 0.0 <= m["roc_auc"] <= 1.0  # fallback model has predict_proba


def test_evaluate_model_regression(featured):
    X_train, X_test, y_train, y_test, names = prepare_dataset(
        featured, as_numpy=True
    )
    model = train_model(X_train, y_train, model_type="regression")
    m = evaluate_model(model, X_test, y_test, model_type="regression")
    assert set(m) == {"mse", "rmse", "mae", "r2"}
    assert m["mse"] >= 0 and abs(m["rmse"] - m["mse"] ** 0.5) < 1e-12
    with pytest.raises(ValueError):
        evaluate_model(model, X_test, y_test, model_type="nope")


def test_classification_report_known_values():
    rep = classification_report_dict([0, 0, 1, 1, 1], [0, 1, 1, 1, 0])
    assert rep["1"]["precision"] == 2 / 3  # tp=2, fp=1
    assert rep["1"]["recall"] == 2 / 3  # tp=2, fn=1
    assert rep["0"]["support"] == 2
    assert abs(rep["accuracy"] - 0.6) < 1e-12
    assert abs(rep["weighted avg"]["recall"] - 0.6) < 1e-12


def test_roc_auc_known_values_and_ties(spark):
    from marketdatapipeline_spark.ml.evaluation import _roc_auc_np

    # no ties: sklearn roc_auc_score == 0.75
    rows = [(0, 0.1), (0, 0.4), (1, 0.35), (1, 0.8)]
    df = spark.createDataFrame(rows, ["target", "score"])
    assert abs(roc_auc(df).first()[0] - 0.75) < 1e-12
    assert abs(_roc_auc_np([0, 0, 1, 1], [0.1, 0.4, 0.35, 0.8]) - 0.75) < 1e-12
    # tied scores use average ranks: AUC = 0.875
    rows = [(0, 0.5), (1, 0.5), (0, 0.2), (1, 0.8)]
    df = spark.createDataFrame(rows, ["target", "score"])
    assert abs(roc_auc(df).first()[0] - 0.875) < 1e-12
    assert abs(_roc_auc_np([0, 1, 0, 1], [0.5, 0.5, 0.2, 0.8]) - 0.875) < 1e-12
    # perfect ranking
    rows = [(0, 0.1), (0, 0.2), (1, 0.3), (1, 0.9)]
    df = spark.createDataFrame(rows, ["target", "score"])
    assert roc_auc(df).first()[0] == 1.0
    # degenerate single-class slice: 0.0 (matching _roc_auc_np), never
    # NULL — a NULL would raise in callers float()-casting the metrics
    rows = [(1, 0.1), (1, 0.9)]
    df = spark.createDataFrame(rows, ["target", "score"])
    assert roc_auc(df).first()[0] == 0.0
    assert _roc_auc_np([1, 1], [0.1, 0.9]) == 0.0
    # empty input: sums are NULL, the guard must coalesce, not crash
    assert roc_auc(df.filter(F.lit(False))).first()[0] == 0.0


def test_roc_auc_small_route_parity(spark):
    """r12: the size_hint fast path (single range-frame window, no
    distinct-score groupBy) must be bit-identical to the distributed
    distinct-score + cumsum route AND to the numpy twin, on random
    scores with forced ties."""
    import random

    from marketdatapipeline_spark.ml.evaluation import _roc_auc_np

    rng = random.Random(7)
    rows = [
        (rng.randint(0, 1), round(rng.uniform(0, 1), 2))  # 2dp => ties
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["target", "score"])
    fast = roc_auc(df, size_hint=500).first()[0]
    dist = roc_auc(df, size_hint=None).first()[0]
    ref = _roc_auc_np(
        np.array([r[0] for r in rows]), np.array([r[1] for r in rows])
    )
    assert fast == dist, (fast, dist)
    assert abs(fast - ref) < 1e-12
    # fast-path degenerate cases share the 0.0-never-NULL guard
    one_class = spark.createDataFrame(
        [(1, 0.3), (1, 0.7)], ["target", "score"]
    )
    assert roc_auc(one_class, size_hint=2).first()[0] == 0.0
    assert roc_auc(
        one_class.filter(F.lit(False)), size_hint=0
    ).first()[0] == 0.0


def test_walk_forward_folds_expanding_and_leak_free(spark):
    """walk_forward_folds: folds partition time correctly — train
    grows by exactly one segment per fold, validation segments are
    disjoint and consecutive, and no validation row predates any of
    its fold's train rows (leakage check)."""
    from pyspark.sql import functions as F

    from marketdatapipeline_spark.ml.preparation import (
        assign_time_segments,
        walk_forward_folds,
    )
    from marketdatapipeline_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts"
    )
    total = ev.count()
    folds = walk_forward_folds(
        ev, 3, order_cols=("ts",), tie_break_cols=("event_id",)
    )
    assert len(folds) == 3

    seg = assign_time_segments(
        ev, 4, order_cols=("ts",), tie_break_cols=("event_id",),
        segment_col="s",
    )
    seg_sizes = {
        r["s"]: r["n"]
        for r in seg.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert sum(seg_sizes.values()) == total
    assert max(seg_sizes.values()) - min(seg_sizes.values()) <= 1  # balanced

    prev_train = 0
    seen_val_ids: set[int] = set()
    for i, (train, val) in enumerate(folds, start=1):
        n_train, n_val = train.count(), val.count()
        assert n_train == sum(seg_sizes[s] for s in range(i))
        assert n_val == seg_sizes[i]
        assert n_train > prev_train  # expanding window
        prev_train = n_train
        # leakage: every val timestamp >= the max train timestamp's
        # segment boundary — check via max(train.ts) <= min over val
        # of the boundary ordering (ties split by event_id, so compare
        # the (ts, event_id) structs)
        t_max = train.select(
            F.max(F.struct("ts", "event_id")).alias("m")
        ).collect()[0]["m"]
        v_min = val.select(
            F.min(F.struct("ts", "event_id")).alias("m")
        ).collect()[0]["m"]
        assert (t_max["ts"], t_max["event_id"]) < (
            v_min["ts"], v_min["event_id"]
        )
        val_ids = {r["event_id"] for r in val.select("event_id").collect()}
        assert not (val_ids & seen_val_ids)  # disjoint validation sets
        seen_val_ids |= val_ids


def test_cross_validate_matches_hand_split(spark, featured):
    """ml.cross_validate == fold-by-fold hand computation: same
    segment cuts, same (deterministic numpy) model fit on the train
    slice, same metrics on the validation slice."""
    import numpy as np

    from marketdatapipeline_spark.ml.validation import cross_validate

    n_folds = 2
    feats = feature_columns(featured)
    res = cross_validate(
        featured,
        n_folds=n_folds,
        model_type="classification",
        order_cols=("datetime",),
    )
    assert len(res["folds"]) == n_folds

    # ---- hand computation on the driver ----
    pdf = (
        featured.select("datetime", *feats, "target")
        .toPandas()
        .dropna(subset=[*feats, "target"])
    )
    # assign_time_segments semantics: global rank by (datetime, ties by
    # remaining cols) -> segment floor((r-1)*k/n). The fixture has a
    # unique (symbol-free) datetime ordering per row only after tie
    # break; replicate with a stable sort on datetime then all other
    # columns, matching tie_break_cols = all non-order columns.
    tie_cols = [c for c in pdf.columns if c != "datetime"]
    pdf = pdf.sort_values(["datetime", *tie_cols]).reset_index(drop=True)
    n = len(pdf)
    k = n_folds + 1
    pdf["_seg"] = ((np.arange(n)) * k) // n

    for fold in res["folds"]:
        i = fold["fold"]
        tr = pdf[pdf["_seg"] < i]
        va = pdf[pdf["_seg"] == i]
        assert fold["n_train"] == len(tr)
        assert fold["n_val"] == len(va)
        model = train_model(
            tr[feats].to_numpy("float64"),
            tr["target"].to_numpy("float64"),
            model_type="classification",
        )
        yv = va["target"].to_numpy("float64").astype(int)
        pv = model.predict(va[feats].to_numpy("float64")).astype(int)
        acc = float((yv == pv).mean())
        assert fold["accuracy"] == pytest.approx(acc, abs=1e-12)
        tp = int(((yv == 1) & (pv == 1)).sum())
        fp = int(((yv == 0) & (pv == 1)).sum())
        fn = int(((yv == 1) & (pv == 0)).sum())
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        assert fold["precision"] == pytest.approx(prec, abs=1e-12)
        assert fold["recall"] == pytest.approx(rec, abs=1e-12)
        assert 0.0 <= fold.get("roc_auc", 0.5) <= 1.0

    # aggregate = unweighted mean across folds
    for m in ("accuracy", "precision", "recall", "f1"):
        want = sum(f[m] for f in res["folds"]) / n_folds
        assert res["aggregate"][m] == pytest.approx(want, abs=1e-12)


def test_cross_validate_regression_and_validation_errors(spark, featured):
    from marketdatapipeline_spark.features.targets import generate_targets

    from marketdatapipeline_spark.ml.validation import cross_validate

    reg = generate_targets(
        featured.drop("target"), horizon=1, target_type="regression"
    )
    res = cross_validate(reg, n_folds=2, model_type="regression")
    for f in res["folds"]:
        assert set(("mse", "rmse", "mae", "r2")) <= set(f)
        assert f["mse"] >= 0 and f["rmse"] == pytest.approx(f["mse"] ** 0.5)
    assert "roc_auc" not in res["aggregate"]

    with pytest.raises(ValueError, match="n_folds"):
        cross_validate(featured, n_folds=0)
    with pytest.raises(ValueError, match="model type"):
        cross_validate(featured, n_folds=2, model_type="ranking")


def test_grid_search_selects_best_candidate(spark, featured):
    """grid_search == running cross_validate per candidate and picking
    the best aggregate metric; ties and ordering are deterministic."""
    from marketdatapipeline_spark.features.targets import generate_targets
    from marketdatapipeline_spark.ml.validation import cross_validate, grid_search

    reg = generate_targets(
        featured.drop("target"), horizon=1, target_type="regression"
    )
    grid = {"reg_lambda": [0.1, 10.0]}
    res = grid_search(
        reg,
        grid,
        n_folds=2,
        model_type="regression",
    )
    assert res["selection_metric"] == "rmse"
    assert len(res["results"]) == 2
    assert [r["params"] for r in res["results"]] == [
        {"reg_lambda": 0.1},
        {"reg_lambda": 10.0},
    ]
    # hand-run each candidate: scores must match, and the pick must be
    # the minimizing one (earliest on a tie)
    scores = []
    for lam in (0.1, 10.0):
        rep = cross_validate(
            reg,
            n_folds=2,
            model_type="regression",
            hyperparameters={"reg_lambda": lam},
        )
        scores.append(rep["aggregate"]["rmse"])
    for got, want in zip(res["results"], scores):
        assert got["score"] == pytest.approx(want, abs=1e-12)
    best_idx = min(range(2), key=lambda i: scores[i])
    assert res["best_params"] == {"reg_lambda": [0.1, 10.0][best_idx]}
    assert res["best_score"] == pytest.approx(scores[best_idx], abs=1e-12)
    # the two candidates must actually fit differently (the fallback
    # honors reg_lambda), otherwise this sweep tests nothing
    assert scores[0] != scores[1]


def test_grid_search_cartesian_and_errors(spark, featured):
    from marketdatapipeline_spark.features.targets import generate_targets
    from marketdatapipeline_spark.ml.validation import grid_search

    with pytest.raises(ValueError, match="at least one parameter"):
        grid_search(featured, {}, n_folds=1)
    with pytest.raises(ValueError, match="no candidate values"):
        grid_search(featured, {"reg_lambda": []}, n_folds=1)
    with pytest.raises(ValueError, match="at least one candidate"):
        grid_search(featured, [], n_folds=1)
    with pytest.raises(ValueError, match="not produced"):
        grid_search(
            generate_targets(
                featured.drop("target"), horizon=1, target_type="regression"
            ),
            {"reg_lambda": [1.0]},
            n_folds=1,
            model_type="regression",
            selection_metric="f1",
        )
    # explicit candidate list + cartesian expansion ordering
    res = grid_search(
        featured,
        {"reg_lambda": [1.0], "max_depth": [3, 5]},
        n_folds=1,
        model_type="classification",
    )
    assert [r["params"] for r in res["results"]] == [
        {"reg_lambda": 1.0, "max_depth": 3},
        {"reg_lambda": 1.0, "max_depth": 5},
    ]


def test_triple_barrier_edge_semantics(spark):
    """Hand-built path: up-first, down-first, ambiguous same-bar touch
    (-> 0), vertical (-> 0), and the unlabelable right edge (-> null)."""
    import datetime as dt

    from marketdatapipeline_spark.ml.labeling import triple_barrier_labels

    base = dt.datetime(2024, 1, 1)
    # one symbol, close path engineered around entry price 100
    rows = []
    closes = [100.0, 100.0, 100.0, 100.0, 100.0, 100.0]
    highs  = [100.0, 111.0, 100.0, 130.0, 100.0, 100.0]
    lows   = [100.0, 100.0,  89.0,  70.0, 100.0, 100.0]
    for i, (c, h, low) in enumerate(zip(closes, highs, lows)):
        rows.append(("A", base + dt.timedelta(minutes=i), i, h, low, c))
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "high", "low", "close"]
    )
    out = {
        r["bar_id"]: r
        for r in triple_barrier_labels(
            df, horizon=2, upper=0.1, lower=0.1
        ).collect()
    }
    # bar 0: future bars 1 (high 111 >= 110) and 2 (low 89 <= 90): up first
    assert out[0]["label"] == 1 and out[0]["hit_offset"] == 1
    # bar 1: future bars 2 (low hits) and 3 (both hit): down first at offset 1
    assert out[1]["label"] == -1 and out[1]["hit_offset"] == 1
    # bar 2: future bar 3 touches BOTH barriers in one bar -> ambiguous 0
    assert out[2]["label"] == 0 and out[2]["hit_offset"] is None
    # bar 3: future bars 4,5 flat -> vertical barrier, plain return present
    assert out[3]["label"] == 0 and out[3]["ret_horizon"] == 0.0
    # bars 4,5: fewer than horizon future bars -> unlabelable
    assert out[4]["label"] is None and out[5]["label"] is None


def test_triple_barrier_null_ohlc_alignment(spark):
    """ADVICE r8: a null high/low inside the forward window must not
    shift array indexes (collect_list drops null scalars) nor mark the
    row unlabelable when `horizon` bars exist. The struct-list rewrite
    keeps one index space: a bar with a null field just can't witness
    a touch on that side."""
    import datetime as dt

    from marketdatapipeline_spark.ml.labeling import triple_barrier_labels

    base = dt.datetime(2024, 1, 1)
    # bar 1 has a NULL high (low intact); bar 3's high touches up.
    closes = [100.0, 100.0, 100.0, 100.0, 100.0, 100.0]
    highs  = [100.0,  None, 100.0, 120.0, 100.0, 100.0]
    lows   = [100.0, 100.0,  None,  85.0, 100.0, 100.0]
    rows = [
        ("A", base + dt.timedelta(minutes=i), i, h, lo, c)
        for i, (c, h, lo) in enumerate(zip(closes, highs, lows))
    ]
    df = spark.createDataFrame(
        rows, ["symbol", "datetime", "bar_id", "high", "low", "close"]
    )
    out = {
        r["bar_id"]: r
        for r in triple_barrier_labels(
            df, horizon=3, upper=0.1, lower=0.1
        ).collect()
    }
    # bar 0: window = bars 1..3. Pre-fix the null high at bar 1
    # compacted _fh to [100, 120] so the up-touch appeared at offset 2
    # AND size(_fh)==2 != horizon marked the row unlabelable (null
    # label). Both hits are at bar 3 = offset 3, and both barriers
    # touch in that one bar -> ambiguous 0, with the row LABELED.
    assert out[0]["label"] == 0 and out[0]["hit_offset"] is None
    # bar 1: window = bars 2..4; up touch at bar 3 = offset 2, low
    # touch also bar 3 -> ambiguous 0 again but crucially offsets
    # agree (pre-fix _fl compacted by bar 2's null low -> _dn index 1
    # vs _up index 2 -> wrong -1 label).
    assert out[1]["label"] == 0
    # bar 2: window = bars 3..5 (no nulls): both touch at offset 1.
    assert out[2]["label"] == 0
    # right edge still unlabelable
    assert out[4]["label"] is None and out[5]["label"] is None


def test_triple_barrier_rejects_bad_horizon(spark):
    from marketdatapipeline_spark.ml.labeling import triple_barrier_labels

    df = spark.range(1).selectExpr(
        "'A' AS symbol", "current_timestamp() AS datetime", "id AS bar_id",
        "1.0 AS high", "1.0 AS low", "1.0 AS close"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="horizon"):
        triple_barrier_labels(df, horizon=0)


def test_standardizer_fit_transform_contract(spark):
    """Stats come from train ONLY; transform applies them to both
    halves; nulls and degenerate (constant) columns stay null."""
    import math

    from marketdatapipeline_spark.ml.scaling import (
        apply_standardizer,
        fit_standardizer,
        standardize_split,
    )

    train = spark.createDataFrame(
        [(1.0, 5.0, 1.0), (2.0, None, 1.0), (3.0, 7.0, 1.0)],
        ["a", "b", "const"],
    )
    test = spark.createDataFrame([(10.0, 6.0, 2.0)], ["a", "b", "const"])
    stats = fit_standardizer(train, ["a", "b", "const"], ddof=0).collect()[0]
    assert stats["a_mean"] == 2.0
    assert abs(stats["a_std"] - math.sqrt(2.0 / 3.0)) < 1e-12
    assert stats["b_mean"] == 6.0  # null excluded per-column
    assert stats["const_std"] is None or stats["const_std"] == 0.0

    tr, te = standardize_split(train, test, ["a", "b", "const"], ddof=0)
    r = te.collect()[0]
    # test rows scale with TRAIN stats: (10 - 2) / sqrt(2/3)
    assert abs(r["a_z"] - (10.0 - 2.0) / math.sqrt(2.0 / 3.0)) < 1e-12
    assert r["const_z"] is None  # degenerate feature never divides
    rows = {row["a"]: row for row in tr.collect()}
    assert rows[2.0]["b_z"] is None  # null value stays null

    # ddof=1 variant (sample std)
    s1 = fit_standardizer(train, ["a"], ddof=1).collect()[0]
    assert abs(s1["a_std"] - 1.0) < 1e-12

    # apply to an unrelated frame (pure transform reuse)
    other = spark.createDataFrame([(0.0,)], ["a"])
    z = apply_standardizer(other, fit_standardizer(train, ["a"]), ["a"]).collect()[0]
    assert abs(z["a_z"] + 2.0 / math.sqrt(2.0 / 3.0)) < 1e-12


def test_psi_drift_semantics(spark):
    """Identical distributions -> PSI ~ 0; a shifted test slab -> large
    PSI; empty bins go through the eps substitution, not inf/NaN."""
    import numpy as np

    from marketdatapipeline_spark.ml.drift import psi_drift

    rng = np.random.RandomState(3)
    a = rng.uniform(0, 100, 2000)
    train = spark.createDataFrame([(float(v),) for v in a], ["x"])
    same = spark.createDataFrame([(float(v),) for v in a[:1000]], ["x"])
    out = psi_drift(train, same, ["x"], n_bins=10).collect()
    total = out[0]["psi_total"]
    assert abs(total) < 0.01  # same distribution
    assert len(out) == 10
    assert sum(r["train_n"] for r in out) == 2000

    # test entirely above the train range: all mass in the top bin
    far = spark.createDataFrame([(float(v + 1000.0),) for v in a[:500]], ["x"])
    drifted = psi_drift(train, far, ["x"], n_bins=10).collect()
    assert drifted[0]["psi_total"] > 1.0
    top = [r for r in drifted if r["bin"] == 9][0]
    assert top["test_pct"] == 1.0
    import math

    assert all(math.isfinite(r["psi_term"]) for r in drifted)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        psi_drift(train, same, ["x"], n_bins=1)
    with _pytest.raises(ValueError, match="method"):
        psi_drift(train, same, ["x"], method="banana")


def test_winsorizer_fit_apply(spark):
    from marketdatapipeline_spark.ml.scaling import (
        apply_winsorizer,
        fit_winsorizer,
    )

    train = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], ["x"]
    )
    stats = fit_winsorizer(train, ["x"], lower=0.1, upper=0.9).collect()[0]
    # quantile_cont over 1..100 at 0.1 -> 10.9, at 0.9 -> 90.1
    assert abs(stats["x_lo"] - 10.9) < 1e-9
    assert abs(stats["x_hi"] - 90.1) < 1e-9
    test = spark.createDataFrame([(1.0,), (50.0,), (99.0,), (None,)], ["x"])
    out = {r["x"]: r for r in apply_winsorizer(
        test, fit_winsorizer(train, ["x"], 0.1, 0.9), ["x"]
    ).collect()}
    assert out[1.0]["x_w"] == stats["x_lo"] and out[1.0]["x_w_clipped"]
    assert out[50.0]["x_w"] == 50.0 and not out[50.0]["x_w_clipped"]
    assert out[99.0]["x_w"] == stats["x_hi"] and out[99.0]["x_w_clipped"]
    assert out[None]["x_w"] is None and not out[None]["x_w_clipped"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower"):
        fit_winsorizer(train, ["x"], 0.9, 0.1)


def test_scale_split_replaces_columns_in_place(spark):
    import math

    from marketdatapipeline_spark.ml.scaling import scale_split

    train = spark.createDataFrame(
        [(1.0, 10.0, "a"), (2.0, 20.0, "b"), (3.0, 30.0, "c")],
        ["x", "y", "keep"],
    )
    test = spark.createDataFrame([(10.0, 0.0, "d")], ["x", "y", "keep"])
    tr, te = scale_split(train, test, ["x", "y"], method="standardize")
    assert set(tr.columns) == {"x", "y", "keep"}  # names preserved
    rows = {r["keep"]: r for r in tr.collect()}
    assert abs(rows["b"]["x"]) < 1e-12  # mean row -> z = 0
    r = te.collect()[0]
    assert abs(r["x"] - (10.0 - 2.0) / math.sqrt(2.0 / 3.0)) < 1e-12

    trw, tew = scale_split(train, test, ["x"], method="winsorize")
    assert set(trw.columns) == {"x", "y", "keep"}  # no _clipped leakage
    assert tew.collect()[0]["x"] <= 3.0  # clipped into train range

    import pytest as _pytest

    with _pytest.raises(ValueError, match="scale method"):
        scale_split(train, test, ["x"], method="nope")


def test_calibration_curve_on_synthetic_scores(spark):
    """A perfectly calibrated score (label ~ Bernoulli(score)) sits
    near the diagonal; a constant-overconfident one shows the gap."""
    import numpy as np

    from marketdatapipeline_spark.ml.drift import calibration_curve

    rng = np.random.RandomState(9)
    s = rng.uniform(0, 1, 4000)
    y = (rng.uniform(0, 1, 4000) < s).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(s, y)], ["score", "label"]
    )
    rows = calibration_curve(df, "score", "label", n_bins=10).collect()
    assert len(rows) == 10
    assert sum(r["n_obs"] for r in rows) == 4000
    for r in rows:
        assert abs(r["gap"]) < 0.08  # binomial noise envelope at n~400
        assert abs(r["gap"] - (r["pos_rate"] - r["mean_score"])) < 1e-12

    # overconfident: always predicts 0.9, truth is 50/50
    over = spark.createDataFrame(
        [(0.9, int(i % 2)) for i in range(1000)], ["score", "label"]
    )
    orow = calibration_curve(over, "score", "label", n_bins=2).collect()
    assert all(abs(r["gap"] + 0.4) < 1e-9 for r in orow)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        calibration_curve(df, "score", "label", n_bins=1)


def test_train_model_real_xgboost_path_when_available():
    """r12 (verdict item 8): when xgboost IS importable, train_model
    must take the real XGBoost path with the reference's
    hyperparameters applied (reference src/ml/training.py:72-126) and
    produce a model whose predictions beat chance on a separable
    fixture. Skip-marked in environments without the package — the
    numpy fallback contract is pinned by the other train_model tests
    either way."""
    import pytest

    xgb = pytest.importorskip("xgboost")
    from marketdatapipeline_spark.ml.training import (
        DEFAULT_HYPERPARAMETERS,
        train_model,
    )

    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 4))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype("int64")
    model = train_model(X, y, "classification")
    assert isinstance(model, xgb.XGBClassifier)
    got = model.get_params()
    for k, v in DEFAULT_HYPERPARAMETERS.items():
        assert got[k] == v, (k, got[k], v)
    acc = float((model.predict(X) == y).mean())
    assert acc > 0.9
    reg = train_model(X, X[:, 0] * 2.0, "regression")
    assert isinstance(reg, xgb.XGBRegressor)
