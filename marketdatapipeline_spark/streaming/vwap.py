"""Online anchored VWAP — the streaming twin of
operators/vwap.py:anchored_vwap.

The batch operator needs each (symbol, period)'s history inside one
window frame; this one carries a **3-field state vector per symbol**
(anchor-period start + the two running sums) across micro-batches via
``applyInPandasWithState``, so an unbounded tick feed gets the running
day/week/month VWAP with O(symbols) state, not O(rows). A tick whose
anchor period differs from the state's resets the sums — the period
rollover needs no timer, the first tick of the new period triggers it.

Batch parity is BIT-exact on an in-order feed: both paths add the
same per-row IEEE products left-to-right (Spark's cumulative window
sum updates incrementally, exactly like the scan here), pinned by
tests/test_streaming.py. Same in-order-per-symbol contract as
online_indicators (stateful.py) — the running sum is order-defined in
any engine.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from marketdatapipeline_spark.streaming.stateful import _ttl_ms

__all__ = ["online_vwap", "online_vwap_batch"]

VWAP_STATE_SCHEMA = StructType(
    [
        StructField("anchor_us", LongType()),  # -1 = fresh
        StructField("pv", DoubleType()),
        StructField("v", DoubleType()),
    ]
)

VWAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("price", DoubleType()),
        StructField("size", DoubleType()),
        StructField("vwap", DoubleType()),
        StructField("vwap_dev", DoubleType()),
    ]
)

_FRESH = (-1, 0.0, 0.0)


def _anchor_us(ts: pd.Series, anchor: str) -> pd.Series:
    """Anchor-period start per tick, as epoch microseconds — the same
    boundaries Spark's date_trunc draws (week starts Monday)."""
    if anchor == "day":
        per = ts.dt.floor("D")
    elif anchor == "week":
        per = (ts - pd.to_timedelta(ts.dt.dayofweek, unit="D")).dt.floor("D")
    elif anchor == "month":
        per = ts.dt.to_period("M").dt.start_time
    else:
        raise ValueError("anchor must be one of ['day', 'month', 'week']")
    return per.astype("int64") // 1000


def _scan_vwap(pdf: pd.DataFrame, st: tuple, anchor: str):
    """Sequential scan: reset sums at each period boundary, then
    pv += price·size, v += size — the identical addition order the
    batch window sum applies."""
    anchors = _anchor_us(pdf["ts"], anchor).to_numpy()
    prices = pdf["price"].to_numpy()
    sizes = pdf["size"].to_numpy()
    a, pv, v = st
    vwaps = []
    for per, p, s in zip(anchors, prices, sizes):
        if per != a:
            a, pv, v = int(per), 0.0, 0.0
        pv += p * s
        v += s
        # None (not NaN) on zero volume: Spark's window-sum division by
        # a zero sum yields NULL, so the stream==batch parity triangle
        # must use the same null convention on degenerate periods.
        vwaps.append(pv / v if v != 0 else None)
    return vwaps, (a, pv, v)


def _vwap_func(anchor: str, state_ttl: str | int | None):
    def func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        st = tuple(state.get) if state.exists else _FRESH
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts")
            vwaps, st = _scan_vwap(pdf, st, anchor)
            out = pd.DataFrame(
                {
                    "symbol": key[0],
                    "ts": pdf["ts"].to_numpy(),
                    "price": pdf["price"].to_numpy(),
                    "size": pdf["size"].to_numpy(),
                    # nullable Float64 so zero-volume None reaches Spark
                    # as NULL (a plain float64 column would coerce it to
                    # NaN and break the null-convention parity)
                    "vwap": pd.array(vwaps, dtype="Float64"),
                }
            )
            out["vwap_dev"] = out["price"] - out["vwap"]
            yield out
        state.update(st)
        if state_ttl is not None:
            state.setTimeoutDuration(_ttl_ms(state_ttl))

    return func


def online_vwap(
    ticks: DataFrame,
    anchor: str = "day",
    state_ttl: str | int | None = None,
) -> DataFrame:
    """Continuous anchored VWAP over a stream of per-symbol ticks
    (``symbol, ts, price, size``): one output row per tick carrying
    the running period VWAP and the price's deviation from it. The
    groupBy(symbol) is the only shuffle; ``state_ttl`` evicts quiet
    symbols exactly as in online_indicators."""
    if state_ttl is not None:
        _ttl_ms(state_ttl)  # fail fast at call time, not mid-stream
    _anchor_us(pd.Series([pd.Timestamp("2024-01-01")]), anchor)  # validate
    return ticks.groupBy("symbol").applyInPandasWithState(
        _vwap_func(anchor, state_ttl),
        outputStructType=VWAP_OUTPUT_SCHEMA,
        stateStructType=VWAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if state_ttl else "NoTimeout",
    )


def online_vwap_batch(ticks: DataFrame, anchor: str = "day") -> DataFrame:
    """Batch twin: the IDENTICAL scan from fresh state over each
    symbol's full in-order history via plain ``applyInPandas`` —
    pytest pins stream == batch-twin AND batch-twin == the window
    operator (operators/vwap.py), closing the parity triangle."""
    _anchor_us(pd.Series([pd.Timestamp("2024-01-01")]), anchor)  # validate

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        vwaps, _ = _scan_vwap(pdf, _FRESH, anchor)
        out = pdf[["symbol", "ts", "price", "size"]].copy()
        # same nullable dtype as the streaming side: None ⇒ NULL
        out["vwap"] = pd.array(vwaps, dtype="Float64")
        out["vwap_dev"] = out["price"] - out["vwap"]
        return out

    return ticks.groupBy("symbol").applyInPandas(
        run, schema=VWAP_OUTPUT_SCHEMA
    )
