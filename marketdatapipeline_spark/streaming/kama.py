"""Online Kaufman adaptive moving average (KAMA).

KAMA's smoothing constant varies per bar with the efficiency ratio
(|net change| / path length over the trailing window), so unlike
RSI/MACD/ATR the recursion has a VARIABLE coefficient —
``kama_t = kama_{t-1} + sc_t (p_t - kama_{t-1})`` with ``sc_t``
data-dependent — and no constant-alpha blocked decomposition
applies. That makes it a natural citizen of the streaming family:
O(window) state per symbol (the trailing closes that define the
efficiency ratio, plus the running KAMA), carried across
micro-batches by ``applyInPandasWithState``, with a batch twin
sharing the scan verbatim (bit-exact stream == batch, the repo's
parity discipline).

Convention (Kaufman's book / the common TA implementation):
``er = |p_t - p_{t-n}| / sum |p_i - p_{i-1}|`` over the window
(0 when the path length is 0), ``sc = (er*(f - s) + s)^2`` with
``f = 2/(fast+1)``, ``s = 2/(slow+1)``; KAMA seeds at the first bar
with a full window (``kama = p`` there), null before.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from marketdatapipeline_spark.streaming.stateful import _ttl_ms

__all__ = ["online_kama", "online_kama_batch"]

KAMA_STATE_SCHEMA = StructType(
    [
        StructField("n_rows", LongType()),
        StructField("tail", ArrayType(DoubleType())),  # last window+1 closes
        StructField("kama", DoubleType()),
    ]
)

KAMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("price", DoubleType()),
        StructField("efficiency_ratio", DoubleType()),
        StructField("kama", DoubleType()),
    ]
)


def _scan_kama(
    prices, st: tuple, window: int, fast: int, slow: int
):
    """THE recurrence, shared by the stream handler and the batch
    twin. ``st = (n_rows, tail, kama)``; returns per-row
    (er, kama-or-None) plus the advanced state."""
    n_rows, tail, kama = st
    tail = list(tail)
    f = 2.0 / (fast + 1.0)
    s = 2.0 / (slow + 1.0)
    out = []
    for p in prices:
        p = float(p)
        tail.append(p)
        if len(tail) > window + 1:
            tail.pop(0)
        n_rows += 1
        if len(tail) < window + 1:
            out.append((None, None))
            continue
        path = 0.0
        for i in range(1, len(tail)):
            path += abs(tail[i] - tail[i - 1])
        er = abs(tail[-1] - tail[0]) / path if path > 0 else 0.0
        sc = (er * (f - s) + s) ** 2
        if kama is None or kama != kama:  # seed at first full window
            kama = p
        else:
            kama = kama + sc * (p - kama)
        out.append((er, kama))
    return out, (n_rows, tail, kama)


_FRESH = (0, [], float("nan"))


def _kama_func(window: int, fast: int, slow: int, state_ttl):
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
            vals, st = _scan_kama(pdf["price"], st, window, fast, slow)
            yield pd.DataFrame(
                [
                    (key[0], ts, float(p), er, k)
                    for ts, p, (er, k) in zip(pdf["ts"], pdf["price"], vals)
                ],
                columns=["symbol", "ts", "price", "efficiency_ratio", "kama"],
            )
        state.update(st)
        if state_ttl is not None:
            state.setTimeoutDuration(_ttl_ms(state_ttl))

    return func


def online_kama(
    ticks: DataFrame,
    window: int = 10,
    fast: int = 2,
    slow: int = 30,
    state_ttl: str | None = None,
) -> DataFrame:
    """Continuous KAMA over a tick stream; O(window) state/symbol."""
    if window < 1 or fast < 1 or slow <= fast:
        raise ValueError(
            f"need window >= 1, 1 <= fast < slow; got {window}, {fast}, {slow}"
        )
    if state_ttl is not None:
        _ttl_ms(state_ttl)  # fail fast at call time
    return ticks.groupBy("symbol").applyInPandasWithState(
        _kama_func(window, fast, slow, state_ttl),
        outputStructType=KAMA_OUTPUT_SCHEMA,
        stateStructType=KAMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if state_ttl else "NoTimeout",
    )


def online_kama_batch(
    ticks: DataFrame,
    window: int = 10,
    fast: int = 2,
    slow: int = 30,
    price_col: str = "price",
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Batch twin: the identical ``_scan_kama`` from fresh state over
    each symbol's in-order history."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        list(ticks.schema.fields)
        + [
            StructField("efficiency_ratio", DoubleType()),
            StructField("kama", DoubleType()),
        ]
    )
    order = list(order_cols)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        vals, _ = _scan_kama(pdf[price_col], _FRESH, window, fast, slow)
        extra = pd.DataFrame(vals, columns=["efficiency_ratio", "kama"])
        return pd.concat([pdf, extra], axis=1)

    return ticks.groupBy("symbol").applyInPandas(run, schema=out_schema)
