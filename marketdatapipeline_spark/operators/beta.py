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
one final per-symbol window stage. Rolling co-moments come from
RUNNING ``decimal(38,18)`` sums differenced at the window edge
(prefix-sum trick, r8 — Spark evaluates sliding frames O(rows x
window) but running frames incrementally; decimal addition is exact,
so the difference equals the direct frame sum bit-for-bit and the
oracle's direct rolling sums still match). The beta assembles from
the five sums with identically-ordered scalar double arithmetic:

    beta = (n·srm - sr·sm) / (n·smm - sm·sm)

null until the window fills and when the market variance term is 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from marketdatapipeline_spark.operators.correlation import bar_index_returns

__all__ = ["dual_beta", "rolling_beta"]

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
    # market mean as a WINDOW over the index partition (r8): the
    # groupBy + equi-join-back formulation shuffled the N-row return
    # table twice (once into the agg, once into the join) and paid a
    # join sort; a whole-partition window computes the same
    # decimal-exact mean with ONE exchange on _idx and no join.
    wm = Window.partitionBy("_idx")
    j = rets.withColumn(
        "_m",
        F.sum(F.col("_ret").cast(_DEC)).over(wm).cast("double")
        / F.count(F.lit(1)).over(wm),
    )
    # O(n) rolling sums via prefix differences (the RollingPlan trick,
    # features/windows.py): Spark re-aggregates a sliding frame per
    # output row — O(rows x window), 4 decimal sums x window 60 was
    # ~240M decimal adds per 1M rows (r7's 2.9 s median). Running
    # decimal sums are incremental and EXACT, so the frame sum
    # S_t - S_{t-n} is bit-identical to the direct aggregation and the
    # DuckDB oracle (which keeps its direct rolling sums) still
    # matches. Two chained Window nodes, same partitioning: one
    # exchange, one sort.
    wc = (
        Window.partitionBy("_sym")
        .orderBy("_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("_sym").orderBy("_idx")
    r, m = F.col("_ret"), F.col("_m")
    # running sums NARROW to decimal(28,18) before the diff (r9): a
    # (38,18)-(38,18) subtraction needs precision 39, which Spark's
    # allowPrecisionLoss resolves by dropping a scale digit — 1 ulp at
    # 1e-17 vs the oracle's direct frame sums, exactly the noise that
    # can flip a round-6 tie. (28,18)-(28,18) types as (29,18): full
    # scale, bit-identical. Exact while prefix magnitudes < 1e10.
    _NARROW = "decimal(28,18)"
    cums = j.withColumns(
        {
            "_cr": F.sum(r.cast(_DEC)).over(wc).cast(_NARROW),
            "_cm": F.sum(m.cast(_DEC)).over(wc).cast(_NARROW),
            "_crm": F.sum((r * m).cast(_DEC)).over(wc).cast(_NARROW),
            "_cmm": F.sum((m * m).cast(_DEC)).over(wc).cast(_NARROW),
            "_rn": F.row_number().over(wl),
        }
    )

    def frame_sum(c: str) -> F.Column:
        prev = F.lag(F.col(c), window).over(wl)
        return (F.col(c) - F.coalesce(prev, F.lit(0).cast(_NARROW))).cast(
            "double"
        )

    # every joined row is non-null by construction (rets drops null
    # returns; m averages non-nulls), so the frame's row count is
    # min(position, window) — no count window needed
    n = F.least(F.col("_rn"), F.lit(window))
    sr, sm = frame_sum("_cr"), frame_sum("_cm")
    srm, smm = frame_sum("_crm"), frame_sum("_cmm")
    var_m = n * smm - sm * sm
    beta = F.when(
        (n == window) & (var_m > 0), (n * srm - sr * sm) / var_m
    )
    return cums.select(
        F.col("_sym").alias(symbol_col),
        F.col("_idx").alias("bar_index"),
        r.alias("ret"),
        m.alias("mkt_ret"),
        beta.alias("beta"),
    )


def dual_beta(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    min_obs: int = 10,
) -> DataFrame:
    """(symbol, n_up, n_down, beta_up, beta_down): upside/downside
    betas vs the equal-weight market — the asymmetry decomposition
    behind defensive-stock screens (Ang/Chen/Xing downside-risk
    framing): beta conditioned on market-up bars vs market-down bars.

        beta_up   = cov(r, m | m > 0) / var(m | m > 0)
        beta_down = cov(r, m | m < 0) / var(m | m < 0)

    (sample covariance/variance over the conditioned subset; null
    when the subset has < ``min_obs`` bars or zero market variance —
    a one-sided regime degenerates honestly rather than emitting
    ±inf.)

    Plan: the shared :func:`bar_index_returns` window, the r8
    window-based market mean (one _idx exchange, no join), then ONE
    groupBy(symbol) of null-gated conditional decimal co-moment sums
    — ``when(m > 0, ...)`` nulls the off-regime rows and ``sum``
    skips them, so each regime's sums see exactly its bars
    (grouping-insensitive-exact; the oracle's ``CASE WHEN`` sums are
    bit-identical). Map-side combinable, S output rows.
    """
    rets = bar_index_returns(df, price_col, symbol_col, order_cols)
    wm = Window.partitionBy("_idx")
    j = rets.withColumn(
        "_m",
        F.sum(F.col("_ret").cast(_DEC)).over(wm).cast("double")
        / F.count(F.lit(1)).over(wm),
    )
    r, m = F.col("_ret"), F.col("_m")

    def side(tag: str, cond):
        rc = F.when(cond, r)
        mc = F.when(cond, m)
        return [
            F.count(F.when(cond, F.lit(1))).alias(f"n_{tag}"),
            F.sum(rc.cast(_DEC)).cast("double").alias(f"_sr_{tag}"),
            F.sum(mc.cast(_DEC)).cast("double").alias(f"_sm_{tag}"),
            F.sum(F.when(cond, r * m).cast(_DEC))
            .cast("double")
            .alias(f"_srm_{tag}"),
            F.sum(F.when(cond, m * m).cast(_DEC))
            .cast("double")
            .alias(f"_smm_{tag}"),
        ]

    g = j.groupBy(F.col("_sym").alias(symbol_col)).agg(
        *side("up", m > 0), *side("down", m < 0)
    )

    def beta(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        var_m = n * F.col(f"_smm_{tag}") - F.col(f"_sm_{tag}") * F.col(
            f"_sm_{tag}"
        )
        cov = n * F.col(f"_srm_{tag}") - F.col(f"_sr_{tag}") * F.col(
            f"_sm_{tag}"
        )
        return F.when(
            (F.col(f"n_{tag}") >= min_obs) & (var_m > 0), cov / var_m
        )

    return g.select(
        symbol_col,
        "n_up",
        "n_down",
        beta("up").alias("beta_up"),
        beta("down").alias("beta_down"),
    )
