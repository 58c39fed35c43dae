"""Hurst exponent via the aggregated-variance method — the long-
memory / trend-persistence diagnostic (H > 0.5 trending, < 0.5 mean-
reverting, = 0.5 random walk). Complements ``variance_ratio`` (the
pointwise Lo-MacKinlay test at one k) with the REGRESSION across
scales: Var of q-aggregated log returns grows like ``q^{2H}``, so H
is half the slope of ``ln Var(q)`` on ``ln q``.

Plan shape — everything stays relational:

1. one symbol window for log returns + a dense 0-based return index
   (two chained window stages, one exchange);
2. scales fan out by exploding a tiny literal array (rows x
   |scales| — narrow, no join);
3. non-overlapping blocks of q returns aggregate by
   ``floor(idx / q)`` — map-side combinable, decimal sums (the noisy
   libm ``ln`` terms are summed EXACTLY, so both engines aggregate
   identical block returns);
4. per-(symbol, scale) variance from power sums, then the 4-point
   least-squares slope folds in ONE more tiny aggregation (sums over
   |scales| rows per symbol).

No collect, no global sort; the regression runs on symbols x
|scales| rows. A DuckDB oracle phrases the same algebra verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hurst_exponent"]

_DEC = "decimal(38,18)"


def hurst_exponent(
    df: DataFrame,
    scales: tuple[int, ...] = (1, 2, 4, 8),
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, per-scale block variances, n_scales, hurst).

    ``var_q{q}`` is the ddof=1 variance of non-overlapping q-block
    sums of log returns (partial trailing blocks dropped); scales
    with fewer than 2 full blocks or non-positive variance are
    excluded from the regression (``n_scales`` counts the survivors;
    ``hurst`` is null with fewer than 2 points)."""
    if len(scales) < 2 or any(q < 1 for q in scales):
        raise ValueError(f"need >= 2 positive scales, got {scales!r}")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    ret = F.log(F.col(price_col) / F.lag(F.col(price_col)).over(w))
    rets = df.select(
        F.col(symbol_col).alias("symbol"),
        *[F.col(c) for c in order_cols],
        ret.alias("_ret"),
    ).filter(F.col("_ret").isNotNull())
    # Block sums are PREFIX-SUM DIFFERENCES (r10): the q-block ending
    # at index i (i.e. (i+1) % q == 0) sums returns (i-q, i], which is
    # cs(i) - cs(i-q) of the exact decimal running sum — identical
    # values to aggregating the block's returns directly (decimal
    # addition/subtraction is exact), so the DuckDB oracle's direct
    # block GROUP BY is untouched. This replaces a groupBy(symbol, q,
    # block) whose q=1 groups were singletons — a rows x |scales|
    # shuffle with no map-side combining — with ONE window pass (the
    # same exchange that indexes the returns: running sum + one lag
    # per scale in a single WindowExec) and a tiny symbols x |scales|
    # aggregation that combines map-side. sf0.1: 2.36 s -> see bench.
    # The running sum narrows to (28,18) before the lag subtraction so
    # the difference types as (29,18) — full scale, exact (the (38,18)
    # difference would need precision 39 and allowPrecisionLoss drops
    # a scale digit).
    widx = Window.partitionBy("symbol").orderBy(*order_cols)
    wcum = widx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = rets.select(
        "symbol",
        *[F.col(c) for c in order_cols],  # the lag windows below sort on these
        (F.row_number().over(widx) - F.lit(1)).alias("_idx"),
        F.sum(F.col("_ret").cast(_DEC))
        .over(wcum)
        .cast("decimal(28,18)")
        .alias("_cs"),
    )
    zero = F.lit(0).cast("decimal(28,18)")
    # window lags are plain columns first (a generator expression
    # cannot contain window functions), then the per-scale struct
    # array explodes from those columns
    lagged = d.select(
        "symbol",
        "_idx",
        "_cs",
        *[
            F.lag("_cs", int(q)).over(widx).alias(f"_lag{q}")
            for q in scales
        ],
    )
    terms = lagged.select(
        "symbol",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(q)).alias("q"),
                        F.when(
                            (F.col("_idx") + 1) % int(q) == 0,
                            (
                                F.col("_cs")
                                - F.coalesce(F.col(f"_lag{q}"), zero)
                            ).cast("double"),
                        ).alias("_bs"),
                    )
                    for q in scales
                ]
            )
        ).alias("_t"),
    ).select("symbol", F.col("_t.q").alias("q"), F.col("_t._bs").alias("_bs"))
    per_scale = terms.filter(F.col("_bs").isNotNull()).groupBy(
        "symbol", "q"
    ).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("_bs").cast(_DEC)).cast("double").alias("_s1"),
        F.sum((F.col("_bs") * F.col("_bs")).cast(_DEC))
        .cast("double")
        .alias("_s2"),
    )
    n = F.col("n_blocks").cast("double")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - F.lit(1.0))
    per_scale = per_scale.withColumn(
        "var_q", F.when((F.col("n_blocks") >= 2) & (var > 0), var)
    )
    x = F.log(F.col("q").cast("double"))
    y = F.log(F.col("var_q"))
    pts = per_scale.withColumns({"_x": x, "_y": y}).filter(
        F.col("_y").isNotNull()
    )
    reg = pts.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_scales"),
        F.sum(F.col("_x").cast(_DEC)).cast("double").alias("_sx"),
        F.sum(F.col("_y").cast(_DEC)).cast("double").alias("_sy"),
        F.sum((F.col("_x") * F.col("_y")).cast(_DEC)).cast("double").alias("_sxy"),
        F.sum((F.col("_x") * F.col("_x")).cast(_DEC)).cast("double").alias("_sxx"),
        *[
            F.max(F.when(F.col("q") == int(q), F.col("var_q"))).alias(
                f"var_q{q}"
            )
            for q in scales
        ],
    )
    ns = F.col("n_scales").cast("double")
    denom = F.col("_sxx") - F.col("_sx") * F.col("_sx") / ns
    slope = (F.col("_sxy") - F.col("_sx") * F.col("_sy") / ns) / denom
    return reg.select(
        "symbol",
        *[f"var_q{q}" for q in scales],
        "n_scales",
        F.when((F.col("n_scales") >= 2) & (denom > 0), slope / F.lit(2.0)).alias(
            "hurst"
        ),
    )
