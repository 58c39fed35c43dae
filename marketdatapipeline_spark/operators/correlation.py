"""Pairwise return correlation — the sample correlation of simple
returns between every pair of symbols, the input to covariance-based
portfolio construction and regime monitoring.

Alignment: event timestamps are irregular and per-symbol, so series
align on the per-symbol BAR INDEX (row_number over the symbol's own
order) — index i of symbol A pairs with index i of symbol B; the pair
length is the shorter series. This is the dense, gap-free alignment;
calendar alignment is ``resample_ffill`` composed in front.

Plan shape: one window exchange for (return, index), one self
equi-join on the bar index with ``symbol_a < symbol_b`` (no diagonal,
no mirror), one aggregation to co-moment sums per pair. For S symbols
that is S·(S-1)/2 output rows and the join carries only (index,
symbol, return) — never the raw bars. Co-moments accumulate as
``decimal(38,18)`` sums (association-free, so any engine agrees
bit-for-bit); the correlation itself is assembled driver-free from
the five sums with identically-ordered scalar double arithmetic:

    corr = (n·sxy - sx·sy) / sqrt((n·sxx - sx²)·(n·syy - sy²))

null when either variance term is <= 0 (a constant series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bar_index_returns", "pairwise_return_correlation"]


def bar_index_returns(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(_sym, _idx, _ret): simple returns with the per-symbol bar
    index — the aligned-series building block this module and
    :mod:`beta` share. Index 1 (no prior bar) is dropped, so retained
    indexes start at 2. One window exchange on the symbol."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    return df.select(
        F.col(symbol_col).alias("_sym"),
        F.row_number().over(w).alias("_idx"),
        ((F.col(price_col) - prev) / prev).alias("_ret"),
    ).filter(F.col("_ret").isNotNull())


def pairwise_return_correlation(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    min_obs: int = 2,
    lag: int = 0,
) -> DataFrame:
    """(symbol_a, symbol_b, n_obs, corr) for every unordered symbol
    pair with at least ``min_obs`` aligned return observations.

    ``lag=k`` computes the LEAD-LAG cross-correlation: a's return at
    index i pairs with b's at index i+k (does a lead b by k bars?).
    With a nonzero lag the pair is ordered, so both (a, b) and (b, a)
    rows are emitted — corr(a_t, b_{t+k}) and corr(b_t, a_{t+k}) are
    different questions; at lag 0 they coincide and only the
    symbol_a < symbol_b half is kept."""
    rets = bar_index_returns(df, price_col, symbol_col, order_cols)

    a = rets.select(
        F.col("_sym").alias("symbol_a"),
        F.col("_idx"),
        F.col("_ret").alias("_ra"),
    )
    b = rets.select(
        F.col("_sym").alias("symbol_b"),
        (F.col("_idx") - F.lit(lag)).alias("_idx"),
        F.col("_ret").alias("_rb"),
    )
    pair_filter = (
        F.col("symbol_a") < F.col("symbol_b")
        if lag == 0
        else F.col("symbol_a") != F.col("symbol_b")
    )
    pairs = a.join(b, "_idx").filter(pair_filter)

    dec = "decimal(38,18)"
    g = pairs.groupBy("symbol_a", "symbol_b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_ra").cast(dec)).cast("double").alias("_sx"),
        F.sum(F.col("_rb").cast(dec)).cast("double").alias("_sy"),
        F.sum((F.col("_ra") * F.col("_ra")).cast(dec))
        .cast("double")
        .alias("_sxx"),
        F.sum((F.col("_rb") * F.col("_rb")).cast(dec))
        .cast("double")
        .alias("_syy"),
        F.sum((F.col("_ra") * F.col("_rb")).cast(dec))
        .cast("double")
        .alias("_sxy"),
    )
    n = F.col("n_obs")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return (
        g.filter(n >= min_obs)
        .select("symbol_a", "symbol_b", "n_obs", corr.alias("corr"))
    )
