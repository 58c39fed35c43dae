"""Realized return moments and return autocorrelation per symbol —
the distribution-shape and mean-reversion diagnostics a market
pipeline computes next to volatility.

Both operators are one window exchange (per-symbol returns) plus one
aggregation; the aggregation accumulates raw POWER SUMS as
``decimal(38,18)`` (association-free — any engine agrees bit-for-bit,
the same convention as operators/correlation.py), and the moments are
assembled from the sums with identically-ordered scalar double
arithmetic, so a DuckDB oracle reproduces every value exactly under
the catalog's round-to-6.

Scale: power sums are map-side combinable, output is S rows for S
symbols, and nothing beyond the (symbol) exchange moves — the plan is
the one you'd want at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "realized_kernel_volatility",
    "realized_moments",
    "return_autocorrelation",
]

_DEC = "decimal(38,18)"


def realized_moments(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, n_obs, ret_mean, ret_std, ret_skew, ret_kurt): sample
    mean/std (ddof=1) and the moment-estimator skewness g1 and excess
    kurtosis g2 of simple returns, from one pass of exact power sums:

        m2 = s2/n - mean²           (population variance)
        m3 = s3/n - 3·mean·s2/n + 2·mean³
        m4 = s4/n - 4·mean·s3/n + 6·mean²·s2/n - 3·mean⁴
        g1 = m3 / m2^1.5,  g2 = m4 / m2² - 3

    std/skew/kurt are null for degenerate inputs (n < 2 or zero
    variance).

    Returns are computed inline (not via :func:`bar_index_returns`):
    keeping the original symbol column name lets the groupBy reuse the
    window's hash partitioning, so the whole operator is ONE exchange
    (the aliased form costs a second — plan-pinned in test_plans)."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    rets = df.select(
        F.col(symbol_col),
        ((F.col(price_col) - prev) / prev).alias("_ret"),
    ).filter(F.col("_ret").isNotNull())
    r = F.col("_ret")
    g = rets.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(r.cast(_DEC)).cast("double").alias("_s1"),
        F.sum((r * r).cast(_DEC)).cast("double").alias("_s2"),
        F.sum((r * r * r).cast(_DEC)).cast("double").alias("_s3"),
        F.sum((r * r * r * r).cast(_DEC)).cast("double").alias("_s4"),
    )
    n = F.col("n_obs").cast("double")
    mean = F.col("_s1") / n
    m2 = F.col("_s2") / n - mean * mean
    m3 = F.col("_s3") / n - F.lit(3.0) * mean * (F.col("_s2") / n) + F.lit(
        2.0
    ) * mean * mean * mean
    m4 = (
        F.col("_s4") / n
        - F.lit(4.0) * mean * (F.col("_s3") / n)
        + F.lit(6.0) * mean * mean * (F.col("_s2") / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    var_s = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - F.lit(1.0))
    ok = (F.col("n_obs") >= 2) & (m2 > 0)
    return g.select(
        symbol_col,
        "n_obs",
        mean.alias("ret_mean"),
        # var_s >= 0 guard (ADVICE r7): a constant-price symbol's
        # s2 - s1²/n can round to a tiny NEGATIVE double, and
        # sqrt(negative) is NaN Spark-side but an error/NULL in the
        # oracle — null the degenerate case explicitly on both sides
        F.when((F.col("n_obs") >= 2) & (var_s >= 0), F.sqrt(var_s)).alias(
            "ret_std"
        ),
        F.when(ok, m3 / F.pow(m2, F.lit(1.5))).alias("ret_skew"),
        F.when(ok, m4 / (m2 * m2) - F.lit(3.0)).alias("ret_kurt"),
    )


def return_autocorrelation(
    df: DataFrame,
    lag: int = 1,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    min_obs: int = 3,
) -> DataFrame:
    """(symbol, n_obs, autocorr, half_life): lag-``lag`` sample
    autocorrelation of simple returns, and the implied AR(1)
    mean-reversion half-life ``-ln(2)/ln(rho)`` when ``0 < rho < 1``
    (null otherwise — a non-reverting or oscillating series has no
    half-life).

    Unlike the cross-symbol pairwise correlation (which must join),
    the self-lag pairing is just a SECOND ``lag`` window over the same
    per-symbol partitioning — no join anywhere, the agg reuses the
    window exchange, and the whole operator is ONE exchange
    (plan-pinned in test_plans)."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    step1 = df.select(
        F.col(symbol_col),
        *[F.col(c) for c in order_cols],
        ((F.col(price_col) - prev) / prev).alias("_ra"),
    )
    pairs = step1.select(
        F.col(symbol_col),
        F.col("_ra"),
        F.lag(F.col("_ra"), lag).over(w).alias("_rb"),
    ).filter(F.col("_ra").isNotNull() & F.col("_rb").isNotNull())
    g = pairs.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_ra").cast(_DEC)).cast("double").alias("_sx"),
        F.sum(F.col("_rb").cast(_DEC)).cast("double").alias("_sy"),
        F.sum((F.col("_ra") * F.col("_ra")).cast(_DEC))
        .cast("double")
        .alias("_sxx"),
        F.sum((F.col("_rb") * F.col("_rb")).cast(_DEC))
        .cast("double")
        .alias("_syy"),
        F.sum((F.col("_ra") * F.col("_rb")).cast(_DEC))
        .cast("double")
        .alias("_sxy"),
    )
    n = F.col("n_obs")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    rho = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    half = F.when(
        (rho > 0) & (rho < 1), -F.log(F.lit(2.0)) / F.log(rho)
    )
    return (
        g.filter(n >= min_obs)
        .select(
            symbol_col,
            "n_obs",
            rho.alias("autocorr"),
            half.alias("half_life"),
        )
    )


def realized_kernel_volatility(
    df: DataFrame,
    n_lags: int = 5,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, n_obs, rv, rk_var, rk_vol): Bartlett-kernel realized
    variance per symbol — the noise-robust realized-volatility
    estimator (Barndorff-Nielsen/Hansen/Lunde/Shephard family;
    Newey-West weighting):

        rk_var = γ0 + Σ_{h=1..H} (1 - h/(H+1)) · 2·γ_h
        γ_h    = Σ_t r_t · r_{t-h}

    Plain realized variance (``rv`` = γ0) treats microstructure noise
    as signal; the weighted autocovariance terms subtract the serial
    component bid-ask bounce induces. ``rk_vol = sqrt(rk_var)`` when
    positive, null otherwise (the Bartlett weights guarantee
    positive-semidefinite in the H→n limit but finite-sample negatives
    are possible and honest).

    One window exchange produces the return and its H lags; ONE
    groupBy accumulates the H+1 co-moment sums as ``decimal(38,18)``
    (association-free — the oracle's identically-cast sums match
    bit-for-bit); the kernel assembly is literal double arithmetic in
    written order. Map-side combinable, S output rows, nothing but the
    symbol exchange moves.
    """
    if n_lags < 1:
        raise ValueError(f"n_lags must be >= 1, got {n_lags}")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    rets = df.select(
        F.col(symbol_col),
        *[F.col(c) for c in order_cols],
        ((F.col(price_col) - prev) / prev).alias("_ret"),
    )
    lags = rets.select(
        F.col(symbol_col),
        "_ret",
        *[
            F.lag(F.col("_ret"), h).over(w).alias(f"_l{h}")
            for h in range(1, n_lags + 1)
        ],
    ).filter(F.col("_ret").isNotNull())
    r = F.col("_ret")
    g = lags.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum((r * r).cast(_DEC)).cast("double").alias("_g0"),
        *[
            F.sum((r * F.col(f"_l{h}")).cast(_DEC))
            .cast("double")
            .alias(f"_g{h}")
            for h in range(1, n_lags + 1)
        ],
    )
    rk = F.col("_g0")
    for h in range(1, n_lags + 1):
        wgt = 1.0 - h / (n_lags + 1.0)
        rk = rk + F.lit(wgt) * (F.lit(2.0) * F.col(f"_g{h}"))
    out = g.select(
        F.col(symbol_col),
        "n_obs",
        F.col("_g0").alias("rv"),
        rk.alias("rk_var"),
    )
    return out.withColumn(
        "rk_vol", F.when(F.col("rk_var") > 0, F.sqrt(F.col("rk_var")))
    )
