"""Liquidity metrics per symbol — Amihud illiquidity and turnover
statistics, the standard cross-sectional liquidity screens.

One window exchange (per-symbol returns) + one aggregation; per-bar
terms are cast to ``decimal(38,18)`` before the grouped sum so the
accumulation is association-free and a DuckDB oracle matches
bit-for-bit (the repo's exact-sum convention), with the final scalar
division in identically-ordered double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "amihud_illiquidity",
    "corwin_schultz_spread",
    "kyle_lambda",
    "roll_spread",
    "tick_rule_flow",
    "vpin",
]

_DEC = "decimal(38,18)"


def amihud_illiquidity(
    df: DataFrame,
    price_col: str = "close",
    volume_col: str = "volume",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    scale: float = 1e6,
) -> DataFrame:
    """(symbol, n_obs, amihud, dollar_volume): the Amihud (2002)
    illiquidity ratio ``scale * avg(|ret| / (price * volume))`` — the
    price impact per unit of dollar volume — plus the total dollar
    volume over the same bars. Zero-dollar-volume bars are excluded
    (the ratio is undefined there), mirroring the paper's convention
    of dropping no-trade days."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    ret = (F.col(price_col) - prev) / prev
    dollar = F.col(price_col) * F.col(volume_col)
    per_bar = df.select(
        F.col(symbol_col),
        ret.alias("_ret"),
        dollar.alias("_dv"),
    ).filter(F.col("_ret").isNotNull() & (F.col("_dv") > 0))
    term = F.abs(F.col("_ret")) / F.col("_dv")
    g = per_bar.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(term.cast(_DEC)).cast("double").alias("_s"),
        F.sum(F.col("_dv").cast(_DEC)).cast("double").alias("dollar_volume"),
    )
    return g.select(
        symbol_col,
        "n_obs",
        (F.lit(float(scale)) * F.col("_s") / F.col("n_obs").cast("double")).alias(
            "amihud"
        ),
        "dollar_volume",
    )


def _with_tick_sign(
    df: DataFrame,
    price_col: str,
    symbol_col: str,
    order_cols: tuple[str, ...],
    extra,
) -> DataFrame:
    """Project (symbol, *extra, _sgn): the tick-rule trade sign —
    +1 on an uptick, -1 on a downtick, CARRY the previous non-zero
    sign on an unchanged price (the zero-tick rule of Lee-Ready);
    null until the first price move. Two chained window stages (raw
    sign via lag, then last(ignorenulls) carry) sharing one symbol
    exchange — a window function cannot nest inside another, so this
    cannot be a single Column expression."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    prev = F.lag(F.col(price_col)).over(w)
    raw = F.signum(F.col(price_col) - prev)
    step1 = df.select(
        F.col(symbol_col),
        *[F.col(c) for c in order_cols],
        *[e for e in extra],
        raw.alias("_raw"),
    )
    carry = (
        Window.partitionBy(symbol_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return step1.withColumn(
        "_sgn",
        F.last(
            F.when(F.col("_raw") != 0, F.col("_raw")), ignorenulls=True
        ).over(carry),
    ).drop("_raw")


def tick_rule_flow(
    df: DataFrame,
    bucket: str = "hour",
    price_col: str = "close",
    volume_col: str = "volume",
    symbol_col: str = "symbol",
    time_col: str = "datetime",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, bucket_ts, n_buys, n_sells, buy_volume, sell_volume,
    imbalance): signed order-flow per (symbol, time bucket) with
    trade direction inferred by the tick rule — the order-flow
    imbalance input to impact models and toxicity monitors when no
    quote data exists (bars/trades only).

    ``imbalance = (buy_vol - sell_vol) / (buy_vol + sell_vol)``, null
    for buckets with no signed volume. Unsigned rows (leading
    unchanged prices) are excluded from both sides. One window
    exchange on the symbol; the bucket aggregation reuses nothing but
    is map-side combinable; volumes sum as decimals (exact)."""
    signed = _with_tick_sign(
        df,
        price_col,
        symbol_col,
        order_cols,
        [
            F.date_trunc(bucket, F.col(time_col)).alias("bucket_ts"),
            F.col(volume_col).alias("_v"),
        ],
    )
    per = signed.filter(F.col("_sgn").isNotNull())
    buy, sell = F.col("_sgn") == 1, F.col("_sgn") == -1
    g = per.groupBy(symbol_col, "bucket_ts").agg(
        F.sum(buy.cast("long")).alias("n_buys"),
        F.sum(sell.cast("long")).alias("n_sells"),
        # decimal(28,10), not (38,18): DuckDB has no int128 headroom
        # left at precision 38 and silently sums width-38 decimals in
        # DOUBLE — (28,10) sums exactly in both engines (the vwap
        # convention), and volume magnitudes fit with room to spare
        F.sum(
            F.when(buy, F.col("_v")).otherwise(F.lit(0.0)).cast(
                "decimal(28,10)"
            )
        )
        .cast("double")
        .alias("buy_volume"),
        F.sum(
            F.when(sell, F.col("_v")).otherwise(F.lit(0.0)).cast(
                "decimal(28,10)"
            )
        )
        .cast("double")
        .alias("sell_volume"),
    )
    tot = F.col("buy_volume") + F.col("sell_volume")
    return g.withColumn(
        "imbalance",
        F.when(
            tot > 0, (F.col("buy_volume") - F.col("sell_volume")) / tot
        ),
    )


def kyle_lambda(
    df: DataFrame,
    price_col: str = "close",
    volume_col: str = "volume",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    min_obs: int = 10,
) -> DataFrame:
    """(symbol, n_obs, lam): Kyle's lambda — the regression slope of
    the price change on tick-rule-SIGNED volume,
    ``lam = cov(dp, sv) / var(sv)`` — the canonical per-unit price
    impact. Null for symbols with fewer than ``min_obs`` signed
    observations or zero signed-volume variance.

    Same plan family as the other power-sum operators: one symbol
    window (price change + tick sign), one map-side-combinable
    aggregation of decimal(38,18) power sums, slope assembled with
    identically-ordered double arithmetic for the oracle."""
    signed = _with_tick_sign(
        df,
        price_col,
        symbol_col,
        order_cols,
        [F.col(price_col).alias("_p"), F.col(volume_col).alias("_v")],
    )
    w2 = Window.partitionBy(symbol_col).orderBy(*order_cols)
    per = (
        signed.select(
            F.col(symbol_col),
            (F.col("_p") - F.lag(F.col("_p")).over(w2)).alias("_dp"),
            (F.col("_sgn") * F.col("_v")).alias("_sv"),
        )
        .filter(F.col("_dp").isNotNull() & F.col("_sv").isNotNull())
    )
    g = per.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_dp").cast(_DEC)).cast("double").alias("_sp"),
        F.sum(F.col("_sv").cast(_DEC)).cast("double").alias("_ss"),
        F.sum((F.col("_dp") * F.col("_sv")).cast(_DEC))
        .cast("double")
        .alias("_sps"),
        F.sum((F.col("_sv") * F.col("_sv")).cast(_DEC))
        .cast("double")
        .alias("_sss"),
    )
    n = F.col("n_obs").cast("double")
    var_sv = n * F.col("_sss") - F.col("_ss") * F.col("_ss")
    cov = n * F.col("_sps") - F.col("_sp") * F.col("_ss")
    return g.select(
        symbol_col,
        "n_obs",
        F.when(
            (F.col("n_obs") >= min_obs) & (var_sv > 0), cov / var_sv
        ).alias("lam"),
    )


def roll_spread(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    min_obs: int = 10,
) -> DataFrame:
    """(symbol, n_obs, serial_cov, spread): Roll's (1984) implied
    effective spread — ``2 * sqrt(-cov(dp_t, dp_{t-1}))`` from the
    first-order serial covariance of price changes (bid-ask bounce
    makes adjacent changes negatively correlated; the magnitude IS
    the spread). Null when the covariance is non-negative (trending
    samples carry no bounce signal — the paper's own caveat) or when
    fewer than ``min_obs`` change pairs exist.

    Plan: one symbol window (price change + its lag — two chained
    lags sharing the exchange), one map-side-combinable aggregation
    of decimal(38,18) power sums, the sample-covariance assembly in
    identically-ordered double arithmetic."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    dp = F.col(price_col) - F.lag(F.col(price_col)).over(w)
    staged = df.select(
        F.col(symbol_col),
        *[F.col(c) for c in order_cols],
        dp.alias("_dp"),
    )
    prev = F.lag(F.col("_dp")).over(w)
    pairs = staged.select(
        F.col(symbol_col),
        F.col("_dp"),
        prev.alias("_dq"),
    ).filter(F.col("_dp").isNotNull() & F.col("_dq").isNotNull())
    g = pairs.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_dp").cast(_DEC)).cast("double").alias("_sp"),
        F.sum(F.col("_dq").cast(_DEC)).cast("double").alias("_sq"),
        F.sum((F.col("_dp") * F.col("_dq")).cast(_DEC))
        .cast("double")
        .alias("_spq"),
    )
    n = F.col("n_obs").cast("double")
    # sample covariance via the co-moment identity, ddof=1
    cov = (F.col("_spq") - F.col("_sp") * F.col("_sq") / n) / (n - 1)
    return g.select(
        symbol_col,
        "n_obs",
        cov.alias("serial_cov"),
        F.when(
            (F.col("n_obs") >= min_obs) & (cov < 0),
            F.lit(2.0) * F.sqrt(-cov),
        ).alias("spread"),
    )


def corwin_schultz_spread(
    df: DataFrame,
    high_col: str = "high",
    low_col: str = "low",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, n_pairs, mean_spread, mean_spread_raw): the Corwin-
    Schultz (2012) high-low estimator of the effective bid-ask
    spread — quotes-free, like ``roll_spread``, but built from the
    range geometry (highs contain ask-side prints, lows bid-side; a
    two-bar range grows with variance, a one-bar range with variance
    AND spread, and the difference isolates the spread):

    ``beta  = ln(H1/L1)^2 + ln(H2/L2)^2`` (consecutive bars),
    ``gamma = ln(max(H1,H2) / min(L1,L2))^2``,
    ``alpha = (sqrt(2 beta) - sqrt(beta)) / (3 - 2 sqrt(2))
              - sqrt(gamma / (3 - 2 sqrt(2)))``,
    ``s     = 2 (e^alpha - 1) / (1 + e^alpha)``.

    ``mean_spread`` follows the paper's convention of flooring
    negative two-bar estimates at zero before averaging;
    ``mean_spread_raw`` keeps them (the diagnostic view). Pairs with
    a non-positive low are skipped (log undefined).

    One lag window on the symbol + one decimal power-sum aggregation;
    the per-pair chain is scan-side libm, the accumulation is
    association-free.

    The libm chain is STAGED through aliased selects (r10): inlined,
    the single-expression form re-evaluated beta three times, gamma
    twice, and exp(alpha) twice per row — Catalyst's projection
    collapse re-duplicates shared subtrees written as one Column
    expression, and the measured cost was ~4x (1.44 s -> 0.55 s for
    the full query at sf0.1). Each stage materializes its value as an
    attribute, so every log/sqrt/exp runs once per row; the arithmetic
    order is unchanged, so results are bit-identical."""
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    d1 = df.select(
        F.col(symbol_col),
        F.lag(F.col(high_col)).over(w).alias("_h1"),
        F.lag(F.col(low_col)).over(w).alias("_l1"),
        F.col(high_col).alias("_h2"),
        F.col(low_col).alias("_l2"),
    )
    h1, l1 = F.col("_h1"), F.col("_l1")
    h2, l2 = F.col("_h2"), F.col("_l2")
    valid = h1.isNotNull() & (l1 > 0) & (l2 > 0)
    lhl1 = F.log(h1 / l1)
    lhl2 = F.log(h2 / l2)
    lg = F.log(F.greatest(h1, h2) / F.least(l1, l2))
    d2 = d1.select(
        symbol_col,
        (lhl1 * lhl1 + lhl2 * lhl2).alias("_beta"),
        (lg * lg).alias("_gamma"),
        valid.alias("_valid"),
    )
    denom = F.lit(3.0 - 2.0 * 2.0 ** 0.5)
    alpha = (
        F.sqrt(F.lit(2.0) * F.col("_beta")) - F.sqrt(F.col("_beta"))
    ) / denom - F.sqrt(F.col("_gamma") / denom)
    d3 = d2.select(symbol_col, alpha.alias("_alpha"), "_valid")
    d4 = d3.select(
        symbol_col, F.exp(F.col("_alpha")).alias("_ea"), "_valid"
    )
    s = (
        F.lit(2.0)
        * (F.col("_ea") - F.lit(1.0))
        / (F.lit(1.0) + F.col("_ea"))
    )
    per = d4.select(
        F.col(symbol_col),
        F.when(F.col("_valid"), s).alias("_s"),
    ).filter(F.col("_s").isNotNull())
    clamped = F.greatest(F.col("_s"), F.lit(0.0))
    g = per.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(clamped.cast(_DEC)).cast("double").alias("_sc"),
        F.sum(F.col("_s").cast(_DEC)).cast("double").alias("_sr"),
    )
    n = F.col("n_pairs").cast("double")
    return g.select(
        symbol_col,
        "n_pairs",
        (F.col("_sc") / n).alias("mean_spread"),
        (F.col("_sr") / n).alias("mean_spread_raw"),
    )


def vpin(
    df: DataFrame,
    bucket_volume: float,
    window: int = 10,
    price_col: str = "close",
    volume_col: str = "volume",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """(symbol, bucket, n_bars, buy_volume, sell_volume, imbalance,
    vpin): volume-synchronized probability of informed trading
    (Easley, Lopez de Prado, O'Hara 2012) — the flow-toxicity monitor
    that flagged the 2010 flash crash.

    Composition of two primitives already in the engine: trades are
    signed by the tick rule (``_with_tick_sign`` — zero-tick carry),
    time is replaced by the VOLUME clock
    (``operators/volume_bars.py`` bucket assignment: integer-valued
    volumes make boundaries engine-exact), then per bucket
    ``imbalance = |V_buy - V_sell| / V_total`` and
    ``vpin = rolling mean(imbalance, window)`` over the symbol's
    bucket sequence (min_periods == window).

    Unsigned rows (the leading unchanged prices) count toward the
    bucket's clock volume but neither side of the imbalance — the
    standard treatment. Plan: one symbol window (sign + running
    volume), one (symbol, bucket) agg, one tiny window over the
    bucket table. Volumes sum as decimals; the imbalance ratio and
    the rolling mean go through decimal prefix sums — round-6 at
    emission only."""
    signed = _with_tick_sign(
        df, price_col, symbol_col, order_cols, [F.col(volume_col)]
    )
    vol = F.col(volume_col)
    cum = F.sum(vol).over(
        Window.partitionBy(symbol_col).orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    staged = signed.withColumn(
        "_bucket", F.floor((cum - vol) / F.lit(float(bucket_volume)))
    )
    buy = F.when(F.col("_sgn") == 1, vol).otherwise(F.lit(0.0))
    sell = F.when(F.col("_sgn") == -1, vol).otherwise(F.lit(0.0))
    # decimal(28,10) volumes (the tick_rule_flow width: DuckDB silently
    # double-sums width-38 decimals); (28,14) for the sub-1.0 ratios
    vdec = "decimal(28,10)"
    g = staged.groupBy(symbol_col, F.col("_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_bars"),
        F.sum(buy.cast(vdec)).cast("double").alias("buy_volume"),
        F.sum(sell.cast(vdec)).cast("double").alias("sell_volume"),
        F.sum(vol.cast(vdec)).cast("double").alias("_tv"),
    )
    imb = F.when(
        F.col("_tv") > 0,
        F.abs(F.col("buy_volume") - F.col("sell_volume")) / F.col("_tv"),
    )
    g = g.withColumn("imbalance", imb)
    wb = Window.partitionBy(symbol_col).orderBy("bucket")
    wbr = wb.rowsBetween(Window.unboundedPreceding, 0)
    rdec = "decimal(28,14)"
    # narrowed back to (28,14): sum() types the running column
    # (38,14), and the window-edge subtraction below would drop a
    # scale digit under allowPrecisionLoss — 1 ulp of drift vs the
    # oracle's direct frame sums (r9)
    g = g.withColumns(
        {
            "_cs": F.sum(F.col("imbalance").cast(rdec)).over(wbr).cast(rdec),
            "_cc": F.count("imbalance").over(wbr),
        }
    )
    zero = F.lit(0).cast(rdec)
    s = (
        F.col("_cs") - F.coalesce(F.lag(F.col("_cs"), window).over(wb), zero)
    ).cast("double")
    cnt = F.col("_cc") - F.coalesce(
        F.lag(F.col("_cc"), window).over(wb), F.lit(0)
    )
    vp = F.when(cnt == window, s / window)
    return (
        g.withColumn("vpin", vp)
        .select(
            symbol_col, "bucket", "n_bars", "buy_volume", "sell_volume",
            "imbalance", "vpin",
        )
    )
