"""Running-peak drawdown — per symbol, the cumulative maximum of a
price series and the fractional distance below it, the risk metric
behind max-drawdown reporting and stop-out logic.

Plan shape: one cumulative-max window per symbol (a single exchange;
max over doubles is association-free, so there is no cross-engine
accumulation concern at all), then scalar arithmetic. ``drawdown`` is
``close/peak - 1`` (<= 0, exactly 0.0 at each new peak); the identical
scalar division orders the same in any engine, so round-6 compares
need no decimal machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["drawdown_summary", "running_drawdown", "underwater_spells"]


def running_drawdown(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """Add ``peak`` (running max of ``price_col``) and ``drawdown``
    (``price/peak - 1``). The first row of each symbol is its own peak
    (drawdown exactly 0.0)."""
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max(F.col(price_col)).over(w)
    return df.withColumns(
        {"peak": peak, "drawdown": F.col(price_col) / peak - F.lit(1.0)}
    )


def drawdown_summary(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    time_col: str = "datetime",
) -> DataFrame:
    """(symbol, max_drawdown, trough_ts, peak_ts, peak_value,
    trough_value): the worst peak-to-trough loss per symbol with its
    WHEN — the headline number of every risk report, derived from
    :func:`running_drawdown` with two deterministic argmin/argmax
    steps:

    * the trough is the row with the MINIMUM drawdown (ties: earliest
      by the order columns — ``min_by`` on the full order tuple, so
      any engine picks the same row);
    * the peak is the running peak IN FORCE at that trough (carried on
      the same row — no second scan or self-join), and ``peak_ts`` is
      the earliest time that peak price printed, recovered by one
      ``min_by`` over the rows where ``price == peak_at_trough``.

    One window exchange + one aggregation reusing its partitioning; a
    flat (never-below-peak) symbol reports drawdown 0 at its first
    row. Exact values throughout (max/min/division — no accumulation),
    so the oracle compares unrounded except the division's round-6."""
    dd = running_drawdown(df, price_col, symbol_col, order_cols)
    ord_key = F.struct(*[F.col(c) for c in order_cols])
    g = dd.groupBy(symbol_col).agg(
        F.min("drawdown").alias("max_drawdown"),
        F.min_by(
            F.struct(
                F.col(time_col).alias("t"),
                F.col("peak").alias("p"),
                F.col(price_col).alias("v"),
                *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
            ),
            F.struct(F.col("drawdown"), ord_key),
        ).alias("_trough"),
    )
    troughs = g.select(
        symbol_col,
        "max_drawdown",
        F.col("_trough.t").alias("trough_ts"),
        F.col("_trough.p").alias("peak_value"),
        F.col("_trough.v").alias("trough_value"),
        *[
            F.col(f"_trough.o{i}").alias(f"_to{i}")
            for i in range(len(order_cols))
        ],
    )
    # earliest print of the in-force peak price per symbol, restricted
    # to rows AT OR BEFORE the trough (the same price could print
    # again afterwards — that later row is not the drawdown's peak)
    trough_ord = F.struct(
        *[F.col(f"_to{i}") for i in range(len(order_cols))]
    )
    peak_rows = (
        dd.join(
            F.broadcast(
                troughs.select(
                    symbol_col,
                    "peak_value",
                    *[f"_to{i}" for i in range(len(order_cols))],
                )
            ),
            symbol_col,
        )
        .filter(
            (F.col(price_col) == F.col("peak_value"))
            & (ord_key <= trough_ord)
        )
        .groupBy(symbol_col)
        .agg(F.min_by(F.col(time_col), ord_key).alias("peak_ts"))
    )
    troughs = troughs.drop(*[f"_to{i}" for i in range(len(order_cols))])
    return troughs.join(peak_rows, symbol_col).select(
        symbol_col,
        "max_drawdown",
        "peak_ts",
        "trough_ts",
        "peak_value",
        "trough_value",
    )


def underwater_spells(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, n_spells, longest_spell, mean_spell, worst_spell_dd,
    pct_underwater): drawdown DURATION statistics — the companion to
    the magnitude summary (a strategy losing 5% for three years hurts
    differently than 5% for a week).

    A spell is a maximal run of consecutive bars with ``drawdown <
    0``; runs are labeled with the classic two-row-number difference
    (``rn - rn_within_state`` is constant exactly over each run — a
    pure window trick, no sessionize gap logic or Python), then one
    aggregation per spell and one per symbol. ``worst_spell_dd`` is
    the deepest drawdown reached inside the LONGEST spell (ties to
    the earliest spell). Everything rides the symbol exchange; counts
    and lengths are integers, the mean is an integer ratio and the
    drawdowns deterministic IEEE — UNROUNDED."""
    base = running_drawdown(df, price_col, symbol_col, order_cols)
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    under = F.col("drawdown") < 0
    staged = base.withColumns(
        {
            "_rn": F.row_number().over(w),
            "_u": under,
        }
    )
    wu = Window.partitionBy(symbol_col, "_u").orderBy(*order_cols)
    staged = staged.withColumn(
        "_grp", F.col("_rn") - F.row_number().over(wu)
    )
    spells = (
        staged.filter(F.col("_u"))
        .groupBy(symbol_col, "_grp")
        .agg(
            F.count(F.lit(1)).alias("_len"),
            F.min("drawdown").alias("_dd"),
            F.min("_rn").alias("_start"),
        )
    )
    totals = staged.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("_n_bars")
    )
    per_sym = spells.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.max("_len").alias("longest_spell"),
        (F.sum("_len").cast("double") / F.count(F.lit(1))).alias(
            "mean_spell"
        ),
        F.min_by(
            "_dd", F.struct((-F.col("_len")).alias("l"), F.col("_start"))
        ).alias("worst_spell_dd"),
        F.sum("_len").cast("long").alias("_under_bars"),
    )
    out = per_sym.join(totals, symbol_col)
    return out.select(
        symbol_col,
        "n_spells",
        "longest_spell",
        "mean_spell",
        "worst_spell_dd",
        (
            F.col("_under_bars").cast("double")
            / F.col("_n_bars").cast("double")
        ).alias("pct_underwater"),
    )
