"""Vectorized signal backtest — strategy returns, equity curve,
Sharpe, max drawdown, turnover — with zero driver loops.

The classic event-loop backtester iterates bars one at a time; for a
position SIGNAL (not order-book simulation) the whole computation is
relational algebra, and that is what scales to a 100 TB tick store:

- strategy return: ``pos_{t-1} * ret_t - cost * |pos_t - pos_{t-1}|``
  (positions earn the NEXT bar's return — no look-ahead; costs
  charged on position changes);
- equity: ``exp(cumsum(ln(1 + r)))`` — the cumulative product
  rewritten as a running LOG sum, which accumulates through
  ``decimal(38,18)`` (association-free, so any engine and any
  partial-agg order produce identical curves);
- max drawdown: ``min(exp(L_t - runmax(L_t)) - 1)`` — running max of
  the log-equity, again windows only;
- Sharpe: power-sum mean/std of per-bar strategy returns, annualized
  by ``sqrt(periods_per_year)``.

Everything rides ONE window exchange per symbol (signal lag, return,
running sums/max share the partition+order) plus one final power-sum
aggregation to a row per symbol. A DuckDB oracle states the identical
algebra; ln/exp are the libm boundary (round-6 at emission).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["signal_returns", "vector_backtest"]

_DEC = "decimal(38,18)"


def signal_returns(
    df: DataFrame,
    signal_col: str,
    cost: float = 0.0,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """Per-bar strategy accounting: adds ``ret`` (price return),
    ``position`` (the signal LAGGED one bar — you trade at the close
    that produced the signal and earn the next bar), ``trade``
    (|position change| this bar), ``strat_ret`` (position * ret -
    cost * trade), ``log_equity`` (running decimal ln(1+r) sum),
    ``equity`` and ``drawdown`` (vs the running equity peak).

    A null signal is flat (position 0); the first bar of each symbol
    has no return and contributes 0 strategy return (but can incur
    the entry trade cost)."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    p = F.col(price_col)
    ret = (p - F.lag(p).over(w)) / F.lag(p).over(w)
    sig = F.coalesce(F.col(signal_col).cast("double"), F.lit(0.0))
    pos = F.coalesce(F.lag(sig).over(w), F.lit(0.0))
    trade = F.abs(sig - pos)
    strat = pos * F.coalesce(ret, F.lit(0.0)) - F.lit(float(cost)) * trade
    staged = df.withColumns(
        {
            "ret": ret,
            "position": pos,
            "trade": trade,
            "strat_ret": strat,
        }
    )
    log_eq = (
        F.sum(F.log(F.lit(1.0) + F.col("strat_ret")).cast(_DEC))
        .over(run)
        .cast("double")
    )
    staged = staged.withColumn("log_equity", log_eq)
    peak = F.max(F.col("log_equity")).over(run)
    return staged.withColumns(
        {
            "equity": F.exp(F.col("log_equity")),
            "drawdown": F.exp(F.col("log_equity") - peak) - F.lit(1.0),
        }
    )


def vector_backtest(
    df: DataFrame,
    signal_col: str,
    cost: float = 0.0,
    periods_per_year: int = 252,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, n_bars, n_trades, total_return, sharpe, max_drawdown):
    the per-symbol summary over :func:`signal_returns`.

    ``sharpe`` is the ddof=1 annualized mean/std of per-bar strategy
    returns (null for degenerate series); ``max_drawdown`` the worst
    peak-to-trough equity fraction (<= 0); ``n_trades`` the summed
    |position changes| (a flip from +1 to -1 counts 2 — turnover
    units)."""
    per = signal_returns(
        df, signal_col, cost, price_col, symbol_col, order_cols
    )
    r: Column = F.col("strat_ret")
    g = per.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_bars"),
        F.sum(F.col("trade").cast(_DEC)).cast("double").alias("n_trades"),
        F.sum(F.log(F.lit(1.0) + r).cast(_DEC)).cast("double").alias("_l"),
        F.sum(r.cast(_DEC)).cast("double").alias("_s1"),
        F.sum((r * r).cast(_DEC)).cast("double").alias("_s2"),
        F.min("drawdown").alias("max_drawdown"),
    )
    n = F.col("n_bars").cast("double")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - F.lit(1.0))
    mean = F.col("_s1") / n
    sharpe = F.when(
        (F.col("n_bars") >= 2) & (var > 0),
        mean / F.sqrt(var) * F.sqrt(F.lit(float(periods_per_year))),
    )
    return g.select(
        symbol_col,
        "n_bars",
        "n_trades",
        (F.exp(F.col("_l")) - F.lit(1.0)).alias("total_return"),
        sharpe.alias("sharpe"),
        "max_drawdown",
    )
