"""Online CUSUM filter — event-driven sampling for ML pipelines.

The symmetric CUSUM filter (Lopez de Prado, *Advances in Financial
Machine Learning* ch. 2.5.2.1) samples bars only when cumulative
drift exceeds a threshold — the event times that feed triple-barrier
labeling (ml/labeling.py), replacing fixed-interval sampling with
information-driven sampling:

``s_pos = max(0, s_pos + ret)``; ``s_neg = min(0, s_neg + ret)``;
when ``s_pos > h`` -> +1 event, reset ``s_pos``;
when ``s_neg < -h`` -> -1 event, reset ``s_neg``.

The reset makes this a NON-linear recurrence — unlike EWMA there is
no block-parallel decomposition and no SQL restatement, so the
operator lives in the streaming family: per-symbol state (the two
accumulators + last price) carried across micro-batches by
``applyInPandasWithState``, with a batch twin sharing the scan
verbatim (bit-exact parity, the repo's stream==batch discipline).
O(symbols) state; one groupBy(symbol) shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from marketdatapipeline_spark.streaming.stateful import _ttl_ms

__all__ = ["online_cusum", "online_cusum_batch"]

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("n_rows", LongType()),
        StructField("last_price", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
    ]
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("price", DoubleType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("event", IntegerType()),
    ]
)

_FRESH = (0, float("nan"), 0.0, 0.0)


def _scan_cusum(prices, st: tuple, threshold: float):
    """THE recurrence, shared by the stream handler and the batch
    twin. Returns one (s_pos, s_neg, event) triple per row plus the
    advanced state. Returns use simple price returns; the first row
    of a symbol has no return and never fires."""
    n_rows, last, s_pos, s_neg = st
    out = []
    for p in prices:
        p = float(p)
        if n_rows > 0 and last != 0.0:
            ret = (p - last) / last
            s_pos = max(0.0, s_pos + ret)
            s_neg = min(0.0, s_neg + ret)
        event = 0
        if s_pos > threshold:
            event, s_pos = 1, 0.0
        elif s_neg < -threshold:
            event, s_neg = -1, 0.0
        out.append((s_pos, s_neg, event))
        last = p
        n_rows += 1
    return out, (n_rows, last, s_pos, s_neg)


def _cusum_func(threshold: float, state_ttl: str | int | None):
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
            vals, st = _scan_cusum(pdf["price"], st, threshold)
            yield pd.DataFrame(
                [
                    (key[0], ts, float(p), sp, sn, ev)
                    for ts, p, (sp, sn, ev) in zip(
                        pdf["ts"], pdf["price"], vals
                    )
                ],
                columns=["symbol", "ts", "price", "s_pos", "s_neg", "event"],
            )
        state.update(st)
        if state_ttl is not None:
            state.setTimeoutDuration(_ttl_ms(state_ttl))

    return func


def online_cusum(
    ticks: DataFrame,
    threshold: float,
    state_ttl: str | None = None,
) -> DataFrame:
    """Continuous symmetric CUSUM filtering over a tick stream.
    ``event`` is +1/-1 on threshold crossings, 0 otherwise — filter
    on it downstream to get the sampled event times."""
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    if state_ttl is not None:
        _ttl_ms(state_ttl)  # fail fast at call time
    return ticks.groupBy("symbol").applyInPandasWithState(
        _cusum_func(float(threshold), state_ttl),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout" if state_ttl else "NoTimeout",
    )


def online_cusum_batch(
    df: DataFrame,
    threshold: float,
    price_col: str = "price",
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Batch twin: identical ``_scan_cusum`` from fresh state over
    each symbol's in-order history; adds s_pos/s_neg/event."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            StructField("s_pos", DoubleType()),
            StructField("s_neg", DoubleType()),
            StructField("event", IntegerType()),
        ]
    )
    order = list(order_cols)
    th = float(threshold)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        vals, _ = _scan_cusum(pdf[price_col], _FRESH, th)
        extra = pd.DataFrame(vals, columns=["s_pos", "s_neg", "event"])
        extra["event"] = extra["event"].astype("int32")
        return pd.concat([pdf, extra], axis=1)

    return df.groupBy("symbol").applyInPandas(run, schema=out_schema)
