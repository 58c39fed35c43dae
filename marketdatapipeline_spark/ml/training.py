"""Model training (reference src/ml/training.py:72-126).

The reference fits a single-node XGBoost on the collected matrix; at
its data volumes (hundreds to low-millions of post-dropna rows) the
fit is driver-side work in any engine. Strategy:

- if ``xgboost`` is importable, use ``XGBClassifier``/``XGBRegressor``
  with the reference's exact defaults (n_estimators=100, max_depth=6,
  learning_rate=0.1, subsample=0.8, colsample_bytree=0.8, seed=42 —
  reference src/config.py:51-55);
- otherwise fall back to a deterministic pure-numpy model with the
  same API surface (predict / predict_proba / feature_importances_):
  L2-regularized logistic regression fit by full-batch Newton-ish
  gradient descent for classification, ridge regression by normal
  equations for regression. The fallback keeps every downstream code
  path (evaluation, distributed inference, persistence) exercisable
  in environments without the native library — it is NOT a quality
  substitute for gradient-boosted trees and says so loudly.

At cluster scale, swap ``train_model`` for ``xgboost.spark
.SparkXGBClassifier`` (same library, distributed histogram building);
the surrounding prepare/evaluate/predict stages are already
distributed and unchanged.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

try:  # pragma: no cover - environment-dependent
    import xgboost as _xgb
except ImportError:  # pragma: no cover
    _xgb = None

DEFAULT_HYPERPARAMETERS = {
    "n_estimators": 100,
    "max_depth": 6,
    "learning_rate": 0.1,
    "subsample": 0.8,
    "colsample_bytree": 0.8,
    "random_state": 42,
}


class NumpyLogisticModel:
    """Fallback classifier: L2 logistic regression, deterministic."""

    def __init__(self, l2: float = 1.0, iters: int = 200, lr: float = 0.5):
        self.l2, self.iters, self.lr = l2, iters, lr
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0
        self._mu: np.ndarray | None = None
        self._sigma: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "NumpyLogisticModel":
        X = np.asarray(X, dtype="float64")
        y = np.asarray(y, dtype="float64")
        self._mu = X.mean(axis=0)
        self._sigma = X.std(axis=0)
        self._sigma[self._sigma == 0] = 1.0
        Z = (X - self._mu) / self._sigma
        n, d = Z.shape
        wb = np.zeros(d + 1)
        Zb = np.hstack([Z, np.ones((n, 1))])
        for _ in range(self.iters):
            p = 1.0 / (1.0 + np.exp(-Zb @ wb))
            grad = Zb.T @ (p - y) / n
            grad[:-1] += self.l2 * wb[:-1] / n
            wb -= self.lr * grad
        self.coef_, self.intercept_ = wb[:-1], wb[-1]
        return self

    def _z(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X, dtype="float64") - self._mu) / self._sigma

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        p1 = 1.0 / (1.0 + np.exp(-(self._z(X) @ self.coef_ + self.intercept_)))
        return np.column_stack([1.0 - p1, p1])

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X)[:, 1] > 0.5).astype("int64")

    @property
    def feature_importances_(self) -> np.ndarray:
        imp = np.abs(self.coef_)
        s = imp.sum()
        return imp / s if s > 0 else imp


class NumpyRidgeModel:
    """Fallback regressor: ridge by normal equations, deterministic."""

    def __init__(self, l2: float = 1.0):
        self.l2 = l2
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "NumpyRidgeModel":
        X = np.asarray(X, dtype="float64")
        y = np.asarray(y, dtype="float64")
        mu, sigma = X.mean(axis=0), X.std(axis=0)
        sigma[sigma == 0] = 1.0
        self._mu, self._sigma = mu, sigma
        Z = (X - mu) / sigma
        n, d = Z.shape
        A = Z.T @ Z + self.l2 * np.eye(d)
        b = Z.T @ (y - y.mean())
        self.coef_ = np.linalg.solve(A, b)
        self.intercept_ = float(y.mean())
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        Z = (np.asarray(X, dtype="float64") - self._mu) / self._sigma
        return Z @ self.coef_ + self.intercept_

    @property
    def feature_importances_(self) -> np.ndarray:
        imp = np.abs(self.coef_)
        s = imp.sum()
        return imp / s if s > 0 else imp


def train_model(
    X_train: np.ndarray,
    y_train: np.ndarray,
    model_type: str = "classification",
    hyperparameters: dict | None = None,
    save_path: str | None = None,
):
    """Fit a model (reference src/ml/training.py:72-126).

    XGBoost when available; deterministic numpy fallback otherwise
    (see module docstring).
    """
    params = {**DEFAULT_HYPERPARAMETERS, **(hyperparameters or {})}
    if model_type not in ("classification", "regression"):
        raise ValueError(f"Unsupported model type: {model_type}")

    if _xgb is not None:
        if model_type == "classification":
            model = _xgb.XGBClassifier(
                objective="binary:logistic", eval_metric="logloss", **params
            )
        else:
            model = _xgb.XGBRegressor(
                objective="reg:squarederror", eval_metric="rmse", **params
            )
    else:
        # reg_lambda is XGBoost's L2 term (its default is also 1.0 and
        # it is absent from DEFAULT_HYPERPARAMETERS), so the fallback
        # honors the one regularization knob both families share —
        # default-path fits stay bit-identical
        l2 = float(params.get("reg_lambda", 1.0))
        model = (
            NumpyLogisticModel(l2=l2)
            if model_type == "classification"
            else NumpyRidgeModel(l2=l2)
        )
    model.fit(X_train, y_train)
    if save_path:
        save_model(model, save_path)
    return model


def save_model(model, path: str) -> None:
    """Pickle sink (reference training.py:120-124; naming main.py:157)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "wb") as f:
        pickle.dump(model, f)
