"""Rolling market beta — each symbol's return sensitivity to the
equal-weight market, estimated over a trailing window: the core
exposure number behind hedging, risk attribution, and beta-neutral
portfolio construction.

``beta = cov(r, m) / var(m)`` over the last ``window`` aligned
observations, where ``m`` is the equal-weight mean return across
symbols at the same bar index (the alignment convention of
:mod:`correlation`; compose ``resample_ffill`` in front for calendar
alignment).

Plan shape: one window exchange for (return, index), one aggregation
to the market series (an exchange on the index; the market frame has
rows/S rows — it shuffles, it is NOT broadcast, so the plan holds
when the series itself is huge), one equi-join back on the index, and
one final rolling window per symbol. Co-moments accumulate as
``decimal(38,18)`` window sums (association-free); the beta assembles
from the five sums with identically-ordered scalar double arithmetic:

    beta = (n·srm - sr·sm) / (n·smm - sm·sm)

null until the window fills and when the market variance term is 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketdatapipeline_spark.operators.correlation import bar_index_returns

__all__ = ["rolling_beta"]

_DEC = "decimal(38,18)"


def rolling_beta(
    df: DataFrame,
    window: int = 60,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, bar_index, ret, mkt_ret, beta): per-symbol trailing
    ``window`` beta vs the equal-weight market return at each aligned
    bar index (null until ``window`` observations accumulate)."""
    rets = bar_index_returns(df, price_col, symbol_col, order_cols)
    mkt = rets.groupBy("_idx").agg(
        (
            F.sum(F.col("_ret").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("_m")
    )
    j = rets.join(mkt, "_idx")
    w = (
        Window.partitionBy("_sym")
        .orderBy("_idx")
        .rowsBetween(-(window - 1), 0)
    )

    def s(col) -> F.Column:
        return F.sum(col.cast(_DEC)).over(w).cast("double")

    r, m = F.col("_ret"), F.col("_m")
    n = F.count(F.lit(1)).over(w)
    sr, sm = s(r), s(m)
    srm, smm = s(r * m), s(m * m)
    var_m = n * smm - sm * sm
    beta = F.when(
        (n == window) & (var_m > 0), (n * srm - sr * sm) / var_m
    )
    return j.select(
        F.col("_sym").alias(symbol_col),
        F.col("_idx").alias("bar_index"),
        r.alias("ret"),
        m.alias("mkt_ret"),
        beta.alias("beta"),
    )
