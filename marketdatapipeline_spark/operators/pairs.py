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

Scale note (r11): a single pair's aligned series is usually one
symbol's history — the same per-partition footprint as every
per-symbol window in this package — so BELOW
``PAIR_SINGLE_TASK_THRESHOLD`` aligned rows the rolling windows run
in one task (Window.partitionBy a constant), which is the fastest
physical plan at that size. Above it (a decade of tick-grade bars)
both operators route to the distributed twin: trailing sums become
prefix-differences of ``operators/ranking.py``'s distributed global
cumsums, fetched by an equi-join on ``rank - window`` — no task ever
holds the whole series. The routing probe is a scan-side count of the
pair's bars (predicate pushdown, no window, no groupBy), and both
routes are value-identical: the cumulative sums are exact decimals,
narrowed one digit before the window-edge subtraction so the
difference re-widens without precision loss (the r9 lesson), so
prefix-difference equals the window's direct w-term sum bit-for-bit.
For a BOOK of pairs, call once per pair (each call is independent) or
lift ``symbol_a``/``symbol_b`` into a pair-key column and partition
on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pair_spread_zscore", "rolling_pair_correlation"]

_DEC = "decimal(38,18)"

#: above this many ALIGNED pair rows the rolling windows leave the
#: single-task plan for the distributed prefix-difference path (same
#: size-routing convention as operators/ranking.py)
PAIR_SINGLE_TASK_THRESHOLD = 2_000_000


def _pair_probe(
    df: DataFrame, symbol_a: str, symbol_b: str, price_col: str,
    symbol_col: str, threshold: int | None,
) -> tuple[DataFrame, int, bool]:
    """(filtered two-symbol frame, scan-side row count, use_single).

    The probe is a plain count over the pushed-down filter — no
    window, no groupBy — and its result upper-bounds the aligned
    length (aligned rows = min of the two legs ≤ count/2), so routing
    errs toward the distributed path, never toward overloading the
    single task. Routing is purely physical: both branches are
    value-identical (randomized forced-route parity tests)."""
    thr = PAIR_SINGLE_TASK_THRESHOLD if threshold is None else threshold
    two_src = df.filter(
        F.col(symbol_col).isin([symbol_a, symbol_b])
        & F.col(price_col).isNotNull()
    )
    n_two = two_src.count()
    return two_src, n_two, n_two <= 2 * thr


def pair_spread_zscore(
    df: DataFrame,
    symbol_a: str,
    symbol_b: str,
    window: int = 20,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    single_task_threshold: int | None = None,
) -> DataFrame:
    """(bar_index, price_a, price_b, spread, spread_mean, spread_std,
    zscore): the log spread with trailing-``window`` mean / std
    (ddof=1) and z-score, null until the window fills (the
    min_periods=window convention of features/windows.py) or when the
    window's spread is constant (zero std).

    The rolling sums accumulate as ``decimal(38,18)`` so the oracle
    agrees bit-for-bit; the z-score is assembled in double. Size-
    routed (module docstring): big pairs take the distributed
    prefix-difference path, bit-identical to the window plan."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if symbol_a == symbol_b:
        raise ValueError("symbol_a and symbol_b must differ")
    two_src, n_two, use_single = _pair_probe(
        df, symbol_a, symbol_b, price_col, symbol_col, single_task_threshold
    )
    two = two_src.select(
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
    if use_single:
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
        src = aligned
    else:
        from marketdatapipeline_spark.operators.ranking import (
            global_row_number,
        )

        pre = aligned.select(
            "_idx",
            "price_a",
            "price_b",
            "spread",
            F.col("spread").cast(_DEC).alias("_sd"),
            (F.col("spread") * F.col("spread")).cast(_DEC).alias("_sd2"),
        )
        ranked = global_row_number(
            pre,
            F.col("_idx"),
            out_col="_rk",
            cumsum={"_cs": "_sd", "_css": "_sd2"},
            size_hint=n_two,  # routing-only; already known big
            single_task_threshold=single_task_threshold,
        )
        # narrow (38,18) → (37,18) before the window-edge diff: the
        # (37,18)-(37,18) subtraction types as (38,18) with NO
        # precision loss, so prefix-difference == the window's direct
        # w-term sum exactly (cum magnitudes stay < 1e19 by contract
        # of a log-spread series).
        nrw = "decimal(37,18)"
        prev = ranked.select(
            (F.col("_rk") + window).alias("_rk"),
            F.col("_cs").cast(nrw).alias("_pcs"),
            F.col("_css").cast(nrw).alias("_pcss"),
        )
        zero = F.lit(0).cast(nrw)
        src = ranked.join(prev, "_rk", "left")
        s = (
            F.col("_cs").cast(nrw) - F.coalesce(F.col("_pcs"), zero)
        ).cast("double")
        ss = (
            F.col("_css").cast(nrw) - F.coalesce(F.col("_pcss"), zero)
        ).cast("double")
        n = F.least(F.col("_rk"), F.lit(window).cast("long"))
    full = n == window
    mean = F.when(full, s / n)
    var = (ss - s * s / n) / (n - F.lit(1.0))
    std = F.when(full & (var >= 0), F.sqrt(var))
    z = F.when(std > 0, (F.col("spread") - mean) / std)
    return src.select(
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
    single_task_threshold: int | None = None,
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
    two_src, n_two, use_single = _pair_probe(
        df, symbol_a, symbol_b, price_col, symbol_col, single_task_threshold
    )
    two = two_src.select(
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
    dec = "decimal(28,14)"
    x, y = F.col("ret_a"), F.col("ret_b")
    # running sums NARROW back to (28,14) before the window-edge diff
    # (r9): sum() types them (38,14), and a (38,14)-(38,14)
    # subtraction needs precision 39, which allowPrecisionLoss
    # resolves by dropping a scale digit — 1 ulp at 1e-13 vs the
    # oracle's direct frame sums, enough to flip a round-6 tie. The
    # (28,14) re-cast is exact while prefix magnitudes < 1e14, and
    # (28,14)-(28,14) types as (29,14): full scale kept. Both routes
    # perform the identical decimal arithmetic, so they agree
    # bit-for-bit (forced-route parity test).
    zero = F.lit(0).cast(dec)
    moments = {
        "_cx": x.cast(dec),
        "_cy": y.cast(dec),
        "_cxx": (x * x).cast(dec),
        "_cyy": (y * y).cast(dec),
        "_cxy": (x * y).cast(dec),
    }
    if use_single:
        w = Window.orderBy("_idx")
        ra = (F.col("_pa") - F.lag("_pa").over(w)) / F.lag("_pa").over(w)
        rb = (F.col("_pb") - F.lag("_pb").over(w)) / F.lag("_pb").over(w)
        rets = aligned.withColumns({"ret_a": ra, "ret_b": rb}).filter(
            F.col("ret_a").isNotNull() & F.col("ret_b").isNotNull()
        )
        run = Window.orderBy("_idx").rowsBetween(Window.unboundedPreceding, 0)
        rets = rets.withColumns(
            {
                "_cn": F.count(F.lit(1)).over(run),
                **{
                    c: F.sum(expr).over(run).cast(dec)
                    for c, expr in moments.items()
                },
            }
        )
        lag = Window.orderBy("_idx")

        def delta(c):
            return (
                F.col(c) - F.coalesce(F.lag(F.col(c), window).over(lag), zero)
            ).cast("double")

        n = (
            F.col("_cn")
            - F.coalesce(F.lag(F.col("_cn"), window).over(lag), F.lit(0))
        ).cast("double")
    else:
        from marketdatapipeline_spark.operators.ranking import (
            global_row_number,
        )

        # the lag() the single-task plan uses for returns is itself a
        # global window — distribute it the same way: rank the aligned
        # frame once, then the predecessor row is an equi-join on
        # rank-1 (the inner join drops exactly the first row, matching
        # lag()'s leading null + filter).
        rk0 = global_row_number(
            aligned,
            F.col("_idx"),
            out_col="_rk0",
            size_hint=n_two,  # routing-only; already known big
            single_task_threshold=single_task_threshold,
        )
        prev0 = rk0.select(
            (F.col("_rk0") + 1).alias("_rk0"),
            F.col("_pa").alias("_la"),
            F.col("_pb").alias("_lb"),
        )
        ra = (F.col("_pa") - F.col("_la")) / F.col("_la")
        rb = (F.col("_pb") - F.col("_lb")) / F.col("_lb")
        rets = (
            rk0.join(prev0, "_rk0", "inner")
            .withColumns({"ret_a": ra, "ret_b": rb})
            .filter(F.col("ret_a").isNotNull() & F.col("ret_b").isNotNull())
        )
        pre = rets.select(
            "_idx",
            "ret_a",
            "ret_b",
            *[expr.alias("_d" + c) for c, expr in moments.items()],
        )
        ranked = global_row_number(
            pre,
            F.col("_idx"),
            out_col="_rk",
            cumsum={c: "_d" + c for c in moments},
            size_hint=n_two,  # routing-only; already known big
            single_task_threshold=single_task_threshold,
        )
        # same narrowing as the window route: (28,14) cums, (29,14)
        # exact window-edge differences
        ranked = ranked.select(
            "_idx",
            "ret_a",
            "ret_b",
            "_rk",
            *[F.col(c).cast(dec).alias(c) for c in moments],
        )
        prev = ranked.select(
            (F.col("_rk") + window).alias("_rk"),
            *[F.col(c).alias("_p" + c) for c in moments],
        )
        rets = ranked.join(prev, "_rk", "left")

        def delta(c):
            return (
                F.col(c) - F.coalesce(F.col("_p" + c), zero)
            ).cast("double")

        n = F.least(F.col("_rk"), F.lit(window).cast("long")).cast("double")
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
