"""Shared Spark session + tiny deterministic OHLCV fixture."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from marketdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


def _series(symbol: str, n: int, seed: int) -> list[dict]:
    """Deterministic pseudo-random walk; no RNG state dependencies."""
    rows = []
    close = 100.0
    base = dt.datetime(2024, 1, 1, 9, 30)
    for i in range(n):
        # deterministic, sign-alternating increments with drift
        step = math.sin(seed * 10 + i * 0.7) * 2.0 + math.cos(i * 0.3) * 0.5
        close = close + step
        rows.append(
            {
                "symbol": symbol,
                "datetime": base + dt.timedelta(minutes=i),
                "open": close - 0.5,
                "high": close + 1.0,
                "low": close - 1.0,
                "close": close,
                "volume": float((i * 37 + seed) % 1000 + 1),
            }
        )
    return rows


@pytest.fixture(scope="session")
def bars_pdf() -> pd.DataFrame:
    return pd.DataFrame(_series("AAA", 80, 1) + _series("BBB", 80, 2))


@pytest.fixture(scope="session")
def bars_df(spark, bars_pdf):
    return spark.createDataFrame(bars_pdf)
