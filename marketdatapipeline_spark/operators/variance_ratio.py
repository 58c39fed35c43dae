"""Variance-ratio test statistic (Lo-MacKinlay) per symbol — the
standard random-walk / mean-reversion diagnostic: under a random walk
the variance of k-period returns is k times the variance of 1-period
returns, so ``VR(k) = Var(r_k) / (k · Var(r_1))`` near 1; VR < 1
signals mean reversion, VR > 1 momentum.

Built on overlapping k-period LOG returns (``ln(P_t / P_{t-k})`` —
the additive return convention the statistic is defined for), both
variances sample (ddof=1). One window exchange per symbol computes
BOTH lags; the aggregation accumulates raw power sums as
``decimal(38,18)`` (association-free — any engine agrees bit-for-bit,
the house convention from operators/moments.py), and the ratio is
assembled with identically-ordered scalar double arithmetic so a
DuckDB oracle reproduces every value exactly under round-to-6.

Scale: the plan is a window + one map-side-combinable aggregation to
S rows; nothing beyond the (symbol) exchange moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["variance_ratio"]

_DEC = "decimal(38,18)"


def variance_ratio(
    df: DataFrame,
    k: int = 5,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    min_obs: int = 10,
) -> DataFrame:
    """(symbol, n_obs_1, n_obs_k, vr): the k-period variance ratio of
    log returns. ``n_obs_1`` / ``n_obs_k`` are the 1-period and
    overlapping k-period return counts; ``vr`` is null for degenerate
    series (fewer than ``min_obs`` k-period returns or zero 1-period
    variance)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    p = F.col(price_col)
    r1 = F.log(p / F.lag(p, 1).over(w))
    rk = F.log(p / F.lag(p, k).over(w))
    rets = df.select(
        F.col(symbol_col), r1.alias("_r1"), rk.alias("_rk")
    )
    g = rets.groupBy(symbol_col).agg(
        F.count("_r1").alias("n_obs_1"),
        F.count("_rk").alias("n_obs_k"),
        F.sum(F.col("_r1").cast(_DEC)).cast("double").alias("_s1"),
        F.sum((F.col("_r1") * F.col("_r1")).cast(_DEC))
        .cast("double")
        .alias("_s11"),
        F.sum(F.col("_rk").cast(_DEC)).cast("double").alias("_sk"),
        F.sum((F.col("_rk") * F.col("_rk")).cast(_DEC))
        .cast("double")
        .alias("_skk"),
    )
    n1 = F.col("n_obs_1").cast("double")
    nk = F.col("n_obs_k").cast("double")
    var1 = (F.col("_s11") - F.col("_s1") * F.col("_s1") / n1) / (
        n1 - F.lit(1.0)
    )
    vark = (F.col("_skk") - F.col("_sk") * F.col("_sk") / nk) / (
        nk - F.lit(1.0)
    )
    ok = (F.col("n_obs_k") >= min_obs) & (var1 > 0)
    return g.select(
        symbol_col,
        "n_obs_1",
        "n_obs_k",
        F.when(ok, vark / (F.lit(float(k)) * var1)).alias("vr"),
    )
