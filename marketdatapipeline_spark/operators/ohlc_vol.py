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

    w = (
        Window.partitionBy(symbol_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )

    def vol(term: Column, scale: float | None = None) -> Column:
        t = term.cast("decimal(28,14)") if exact_decimal else term
        s = F.sum(t).over(w)
        if exact_decimal:
            s = s.cast("double")
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
