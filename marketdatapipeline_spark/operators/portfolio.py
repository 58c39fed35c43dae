"""Weighted portfolio return series — collapse per-symbol returns
into one portfolio return per aligned bar index, given a weights
table: the aggregation layer under backtests and risk reports.

``port_ret_i = Σ w_s · r_{s,i} / Σ w_s`` over the symbols PRESENT at
index i (renormalizing by the present weight mass — the standard
treatment of a symbol that has not listed yet / has ended; pass
``renormalize=False`` to divide by the full weight mass instead,
which treats missing symbols as zero-return holdings).

Plan shape: one symbol-window exchange for (return, index), one
BROADCAST join against the weights (a weights table is small by
definition — it enumerates the portfolio), one map-side-combinable
aggregation to one row per index. Weighted sums accumulate as
``decimal(38,18)`` (association-free; the result is round-6-guarded
in the catalog because the weight products are double→decimal casts,
which carry engine cast noise — the centroid lesson)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdatapipeline_spark.operators.correlation import bar_index_returns

__all__ = ["portfolio_returns"]

_DEC = "decimal(38,18)"


def portfolio_returns(
    df: DataFrame,
    weights: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    weight_col: str = "weight",
    renormalize: bool = True,
) -> DataFrame:
    """(bar_index, n_symbols, weight_mass, port_ret): the weighted
    portfolio return per aligned bar index. Symbols absent from the
    weights table are excluded; indices where no weighted symbol has
    a return are absent from the output."""
    rets = bar_index_returns(df, price_col, symbol_col, order_cols)
    w = weights.select(
        F.col(symbol_col).alias("_sym"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    j = rets.join(F.broadcast(w), "_sym")
    g = j.groupBy("_idx").agg(
        F.count(F.lit(1)).alias("n_symbols"),
        F.sum(F.col("_w").cast(_DEC)).cast("double").alias("weight_mass"),
        F.sum((F.col("_w") * F.col("_ret")).cast(_DEC))
        .cast("double")
        .alias("_ws"),
    )
    if renormalize:
        denom = F.col("weight_mass")
    else:
        total = weights.agg(
            F.sum(F.col(weight_col).cast(_DEC)).cast("double").alias("_t")
        )
        g = g.crossJoin(F.broadcast(total))
        denom = F.col("_t")
    return g.select(
        F.col("_idx").alias("bar_index"),
        "n_symbols",
        "weight_mass",
        F.when(denom != 0, F.col("_ws") / denom).alias("port_ret"),
    )
