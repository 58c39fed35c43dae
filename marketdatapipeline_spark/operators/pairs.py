"""Pairs-trading spread and rolling z-score for one symbol pair —
the signal a statistical-arbitrage desk monitors: the log price
spread ``ln(P_a) - ln(P_b)`` and how many rolling standard deviations
it sits from its rolling mean.

Alignment is the house bar-index convention (operators/correlation.py):
each symbol's non-null prices are ranked per symbol and index i of A
pairs with index i of B — dense, gap-free. The two legs collapse into
ONE frame via conditional aggregation on the index (no self-join:
``groupBy(_idx).agg(max(when(sym=a)), max(when(sym=b)))``), then the
rolling stats are two cumulative-window expressions.

Scale note: a single pair's aligned series is one symbol's history —
the same per-partition footprint as every per-symbol window in this
package — so the rolling window runs in ONE task by construction
(Window.partitionBy a constant). That is not a scale-killer, it is
the data shape; for a BOOK of pairs, call once per pair (each call is
independent) or lift ``symbol_a``/``symbol_b`` into a pair-key column
and partition on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pair_spread_zscore", "rolling_pair_correlation"]

_DEC = "decimal(38,18)"


def pair_spread_zscore(
    df: DataFrame,
    symbol_a: str,
    symbol_b: str,
    window: int = 20,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(bar_index, price_a, price_b, spread, spread_mean, spread_std,
    zscore): the log spread with trailing-``window`` mean / std
    (ddof=1) and z-score, null until the window fills (the
    min_periods=window convention of features/windows.py) or when the
    window's spread is constant (zero std).

    The rolling sums accumulate as ``decimal(38,18)`` so the oracle
    agrees bit-for-bit; the z-score is assembled in double."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if symbol_a == symbol_b:
        raise ValueError("symbol_a and symbol_b must differ")
    two = df.filter(
        F.col(symbol_col).isin([symbol_a, symbol_b])
        & F.col(price_col).isNotNull()
    ).select(
        F.col(symbol_col).alias("_sym"),
        F.row_number().over(
            Window.partitionBy(symbol_col).orderBy(*order_cols)
        ).alias("_idx"),
        F.col(price_col).alias("_p"),
    )
    aligned = (
        two.groupBy("_idx")
        .agg(
            F.max(F.when(F.col("_sym") == symbol_a, F.col("_p"))).alias(
                "price_a"
            ),
            F.max(F.when(F.col("_sym") == symbol_b, F.col("_p"))).alias(
                "price_b"
            ),
        )
        .filter(
            F.col("price_a").isNotNull() & F.col("price_b").isNotNull()
        )
        .withColumn(
            "spread", F.log(F.col("price_a")) - F.log(F.col("price_b"))
        )
    )
    roll = (
        Window.partitionBy(F.lit(1))
        .orderBy("_idx")
        .rowsBetween(-(window - 1), 0)
    )
    s = F.sum(F.col("spread").cast(_DEC)).over(roll).cast("double")
    ss = (
        F.sum((F.col("spread") * F.col("spread")).cast(_DEC))
        .over(roll)
        .cast("double")
    )
    n = F.count(F.lit(1)).over(roll)
    full = n == window
    mean = F.when(full, s / n)
    var = (ss - s * s / n) / (n - F.lit(1.0))
    std = F.when(full & (var >= 0), F.sqrt(var))
    z = F.when(std > 0, (F.col("spread") - mean) / std)
    return aligned.select(
        F.col("_idx").alias("bar_index"),
        "price_a",
        "price_b",
        "spread",
        mean.alias("spread_mean"),
        std.alias("spread_std"),
        z.alias("zscore"),
    )


def rolling_pair_correlation(
    df: DataFrame,
    symbol_a: str,
    symbol_b: str,
    window: int = 60,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(bar_index, ret_a, ret_b, n_obs, corr): the trailing-window
    return correlation CURVE for one symbol pair — the regime monitor
    behind every pairs trade (the static matrix says the pair is
    correlated; this says when the relationship broke).

    Same alignment as :func:`pair_spread_zscore` (conditional-agg
    pivot on the bar index — the pair table is two symbols' bars,
    1/S of the corpus, so its single-partition index windows are
    bounded by construction); rolling co-moments ride
    prefix-difference decimal(28,14) sums (exact, O(n)); corr is
    null until the window holds ``window`` aligned return pairs or
    when either side is flat."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if symbol_a == symbol_b:
        raise ValueError("symbol_a and symbol_b must differ")
    two = df.filter(
        F.col(symbol_col).isin([symbol_a, symbol_b])
        & F.col(price_col).isNotNull()
    ).select(
        F.col(symbol_col).alias("_sym"),
        F.row_number().over(
            Window.partitionBy(symbol_col).orderBy(*order_cols)
        ).alias("_idx"),
        F.col(price_col).alias("_p"),
    )
    aligned = (
        two.groupBy("_idx")
        .agg(
            F.max(F.when(F.col("_sym") == symbol_a, F.col("_p"))).alias("_pa"),
            F.max(F.when(F.col("_sym") == symbol_b, F.col("_p"))).alias("_pb"),
        )
        .filter(F.col("_pa").isNotNull() & F.col("_pb").isNotNull())
    )
    w = Window.orderBy("_idx")
    ra = (F.col("_pa") - F.lag("_pa").over(w)) / F.lag("_pa").over(w)
    rb = (F.col("_pb") - F.lag("_pb").over(w)) / F.lag("_pb").over(w)
    rets = aligned.withColumns({"ret_a": ra, "ret_b": rb}).filter(
        F.col("ret_a").isNotNull() & F.col("ret_b").isNotNull()
    )
    dec = "decimal(28,14)"
    run = Window.orderBy("_idx").rowsBetween(Window.unboundedPreceding, 0)
    x, y = F.col("ret_a"), F.col("ret_b")
    # running sums NARROW back to (28,14) before the window-edge diff
    # (r9): sum() types them (38,14), and a (38,14)-(38,14)
    # subtraction needs precision 39, which allowPrecisionLoss
    # resolves by dropping a scale digit — 1 ulp at 1e-13 vs the
    # oracle's direct frame sums, enough to flip a round-6 tie. The
    # (28,14) re-cast is exact while prefix magnitudes < 1e14, and
    # (28,14)-(28,14) types as (29,14): full scale kept.
    rets = rets.withColumns(
        {
            "_cn": F.count(F.lit(1)).over(run),
            "_cx": F.sum(x.cast(dec)).over(run).cast(dec),
            "_cy": F.sum(y.cast(dec)).over(run).cast(dec),
            "_cxx": F.sum((x * x).cast(dec)).over(run).cast(dec),
            "_cyy": F.sum((y * y).cast(dec)).over(run).cast(dec),
            "_cxy": F.sum((x * y).cast(dec)).over(run).cast(dec),
        }
    )
    lag = Window.orderBy("_idx")
    zero = F.lit(0).cast(dec)

    def delta(c):
        return (
            F.col(c) - F.coalesce(F.lag(F.col(c), window).over(lag), zero)
        ).cast("double")

    n = (
        F.col("_cn") - F.coalesce(F.lag(F.col("_cn"), window).over(lag), F.lit(0))
    ).cast("double")
    sx, sy = delta("_cx"), delta("_cy")
    sxx, syy, sxy = delta("_cxx"), delta("_cyy"), delta("_cxy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    corr = F.when(
        (n == window) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    )
    return rets.select(
        F.col("_idx").cast("long").alias("bar_index"),
        "ret_a",
        "ret_b",
        n.cast("int").alias("n_obs"),
        corr.alias("corr"),
    )
