"""Rolling OHLC range volatility estimators — Parkinson,
Garman-Klass, and Rogers-Satchell, the standard high/low-based
volatility family (each uses the intra-bar range, so it converges
~5-8x faster than close-to-close realized vol at the same window).

Definitions (per-bar terms, then a rolling mean over ``window`` bars):

- Parkinson:        ``sqrt( mean(ln(h/l)^2) / (4 ln 2) )``
- Garman-Klass:     ``sqrt( mean(0.5 ln(h/l)^2 - (2 ln 2 - 1) ln(c/o)^2) )``
- Rogers-Satchell:  ``sqrt( mean(ln(h/c) ln(h/o) + ln(l/c) ln(l/o)) )``

Plan shape: the per-bar terms are scan-side codegen expressions; the
three rolling means share ONE window spec, so the whole family costs a
single exchange on symbol. min_periods == window (null until the frame
is full), matching the pandas/reference masking convention (W5/W6).

Cross-engine exactness: with ``exact_decimal=True`` each per-bar term
(an IEEE double — ln may differ by 1 ulp across libms, but that is
~1e-19 absolute here, far below round-6) is cast to decimal(28,14)
before the window sum, so the SUM is association-free and a DuckDB
oracle computing the identical expression matches cell-exactly after
round-6 — same convention as operators/vwap.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ohlc_volatility", "LN2", "GK_COEF"]

#: ln(2) as the exact double literal both engines embed (never call the
#: engine's ln(2) — the literal is bit-pinned).
LN2 = 0.6931471805599453
#: Garman-Klass close-open coefficient 2 ln 2 - 1.
GK_COEF = 2.0 * LN2 - 1.0


def ohlc_volatility(
    df: DataFrame,
    window: int = 20,
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    exact_decimal: bool = False,
) -> DataFrame:
    """Add ``vol_parkinson``, ``vol_garman_klass``, ``vol_rogers_satchell``
    rolling-``window`` columns (null until ``window`` bars accumulate).

    Negative mean guards: Garman-Klass and Rogers-Satchell per-bar
    terms can individually be negative on real data; a (rare) negative
    rolling mean is floored at 0 before the sqrt rather than emitting
    NaN.
    """
    ln_hl = F.log(F.col("high") / F.col("low"))
    ln_co = F.log(F.col("close") / F.col("open"))
    ln_hc = F.log(F.col("high") / F.col("close"))
    ln_ho = F.log(F.col("high") / F.col("open"))
    ln_lc = F.log(F.col("low") / F.col("close"))
    ln_lo = F.log(F.col("low") / F.col("open"))

    terms = {
        "_pk": ln_hl * ln_hl,
        "_gk": F.lit(0.5) * ln_hl * ln_hl - F.lit(GK_COEF) * ln_co * ln_co,
        "_rs": ln_hc * ln_ho + ln_lc * ln_lo,
    }

    if exact_decimal:
        # O(n) rolling sums via prefix differences (RollingPlan trick,
        # features/windows.py, ported here in r8): Spark evaluates a
        # sliding frame O(rows x window) — 3 decimal sums x window 20
        # was ~60M decimal adds per 1M rows — while running frames are
        # incremental. Decimal addition is exact, so S_t - S_{t-w} is
        # bit-identical to the direct frame sum and the oracle's
        # direct rolling sums still match. Only the decimal path uses
        # it: differencing DOUBLE prefix sums would introduce the
        # cancellation error the direct frame sum doesn't have.
        wc = (
            Window.partitionBy(symbol_col)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wl = Window.partitionBy(symbol_col).orderBy(*order_cols)
        cums = {}
        for k, term in terms.items():
            # narrowed back to (28,14): the (38,14) sum type would lose a
            # scale digit under the diff's allowPrecisionLoss rescale (r9)
            cums[f"_cs{k}"] = (
                F.sum(term.cast("decimal(28,14)")).over(wc)
                .cast("decimal(28,14)")
            )
            # the min_periods gate counts NON-NULL terms (a null price
            # nulls its ln-term; counting rows would understate)
            cums[f"_cc{k}"] = F.count(term).over(wc)
        staged = df.withColumns(cums)

        def vol(k: str, scale: float | None = None) -> Column:
            prev = F.lag(F.col(f"_cs{k}"), window).over(wl)
            s = (
                F.col(f"_cs{k}")
                - F.coalesce(prev, F.lit(0).cast("decimal(28,14)"))
            ).cast("double")
            pc = F.lag(F.col(f"_cc{k}"), window).over(wl)
            cnt = F.col(f"_cc{k}") - F.coalesce(pc, F.lit(0))
            mean = s / window
            if scale is not None:
                mean = mean / F.lit(scale)
            # gate BEFORE greatest: greatest() skips nulls, so an
            # ungated null mean would become 0.0 on partial windows
            return F.when(
                cnt == window, F.sqrt(F.greatest(mean, F.lit(0.0)))
            )

        return staged.withColumns(
            {
                "vol_parkinson": vol("_pk", 4.0 * LN2),
                "vol_garman_klass": vol("_gk"),
                "vol_rogers_satchell": vol("_rs"),
            }
        ).drop(*cums)

    w = (
        Window.partitionBy(symbol_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )

    def vol(term: Column, scale: float | None = None) -> Column:
        s = F.sum(term).over(w)
        mean = s / window
        if scale is not None:
            mean = mean / F.lit(scale)
        # the min_periods gate counts NON-NULL terms (a null/degenerate
        # price makes its ln-term null; counting rows instead would
        # emit a silently-understated vol from the surviving terms),
        # and it sits BEFORE greatest: greatest() skips nulls, so an
        # ungated null mean would become 0.0 on partial windows
        full = F.count(term).over(w) == window
        return F.when(full, F.sqrt(F.greatest(mean, F.lit(0.0))))

    return df.withColumns(
        {
            "vol_parkinson": vol(terms["_pk"], 4.0 * LN2),
            "vol_garman_klass": vol(terms["_gk"]),
            "vol_rogers_satchell": vol(terms["_rs"]),
        }
    )
