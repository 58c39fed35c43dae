"""Online Bollinger bands — the streaming twin of the reference's
headline volatility indicator (src/features/engineering.py bb_*).

RSI/MACD, anchored VWAP, ATR, KAMA, the volume clock, and CUSUM
already stream; Bollinger completes the set: O(window) state per
symbol (the trailing closes), ``applyInPandasWithState`` carry, and
a batch twin sharing the scan verbatim (bit-exact stream == batch).
The twin tracks the batch feature pipeline's prefix-sum RollingPlan
to FP-association tolerance — same split as the ATR/Wilder family.

Convention: pandas ``rolling(window, min_periods=window)`` — bands
null until the window fills; std is ddof=1; ``bb_width =
(upper - lower) / middle`` (the reference's definition).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from marketdatapipeline_spark.streaming.stateful import _ttl_ms

__all__ = ["online_bollinger", "online_bollinger_batch"]

BOLL_STATE_SCHEMA = StructType(
    [StructField("tail", ArrayType(DoubleType()))]
)

BOLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("price", DoubleType()),
        StructField("bb_middle", DoubleType()),
        StructField("bb_upper", DoubleType()),
        StructField("bb_lower", DoubleType()),
        StructField("bb_width", DoubleType()),
    ]
)


def _scan_boll(prices, tail: list, window: int, n_std: float):
    """THE scan, shared by stream and twin: per row, the bands from
    the trailing ``window`` closes (None until full). Sums are
    recomputed per row in a FIXED left-to-right order over the
    window buffer, so any two executions agree bit-for-bit."""
    out = []
    for p in prices:
        p = float(p)
        tail.append(p)
        if len(tail) > window:
            tail.pop(0)
        if len(tail) < window:
            out.append((None, None, None, None))
            continue
        s = 0.0
        for v in tail:
            s += v
        mean = s / window
        q = 0.0
        for v in tail:
            d = v - mean
            q += d * d
        std = math.sqrt(q / (window - 1))
        upper = mean + std * n_std
        lower = mean - std * n_std
        out.append((mean, upper, lower, (upper - lower) / mean))
    return out, tail


def _boll_func(window: int, n_std: float, state_ttl):
    def func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (tail,) = state.get if state.exists else ([],)
        tail = list(tail)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts")
            vals, tail = _scan_boll(pdf["price"], tail, window, n_std)
            yield pd.DataFrame(
                [
                    (key[0], ts, float(p), m, u, lo, w)
                    for ts, p, (m, u, lo, w) in zip(
                        pdf["ts"], pdf["price"], vals
                    )
                ],
                columns=[f.name for f in BOLL_OUTPUT_SCHEMA.fields],
            )
        state.update((tail,))
        if state_ttl is not None:
            state.setTimeoutDuration(_ttl_ms(state_ttl))

    return func


def online_bollinger(
    ticks: DataFrame,
    window: int = 20,
    n_std: float = 2.0,
    state_ttl: str | None = None,
) -> DataFrame:
    """Continuous Bollinger bands over a tick stream; O(window)
    state per symbol."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if state_ttl is not None:
        _ttl_ms(state_ttl)  # fail fast at call time
    return ticks.groupBy("symbol").applyInPandasWithState(
        _boll_func(window, float(n_std), state_ttl),
        outputStructType=BOLL_OUTPUT_SCHEMA,
        stateStructType=BOLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if state_ttl else "NoTimeout",
    )


def online_bollinger_batch(
    ticks: DataFrame,
    window: int = 20,
    n_std: float = 2.0,
    price_col: str = "price",
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Batch twin: identical ``_scan_boll`` from fresh state over
    each symbol's in-order history."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        list(ticks.schema.fields)
        + [
            StructField("bb_middle", DoubleType()),
            StructField("bb_upper", DoubleType()),
            StructField("bb_lower", DoubleType()),
            StructField("bb_width", DoubleType()),
        ]
    )
    order = list(order_cols)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        vals, _ = _scan_boll(pdf[price_col], [], window, float(n_std))
        extra = pd.DataFrame(
            vals, columns=["bb_middle", "bb_upper", "bb_lower", "bb_width"]
        )
        return pd.concat([pdf, extra], axis=1)

    return ticks.groupBy("symbol").applyInPandas(run, schema=out_schema)
