"""Schema utilities: fuzzy rename, datetime normalization, align+union."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marketdatapipeline_spark.data.schema import (
    OHLCV_SCHEMA,
    align_and_union,
    conform_to_ohlcv,
    fuzzy_rename_ohlcv,
    normalize_datetime_column,
)


def test_fuzzy_rename_alpha_vantage_style(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 0.5, 1.5, 100.0)],
        ["1. open", "2. high", "3. low", "4. close", "5. volume"],
    )
    out = fuzzy_rename_ohlcv(df)
    assert set(out.columns) == {"open", "high", "low", "close", "volume"}


def test_fuzzy_rename_keeps_canonical(spark):
    df = spark.createDataFrame([(1.0, 2.0)], ["close", "closing_aux"])
    out = fuzzy_rename_ohlcv(df)
    assert out.columns == ["close", "closing_aux"]  # first match already taken


def test_normalize_datetime_prefers_candidate_names(spark):
    schema = T.StructType(
        [
            T.StructField("created", T.TimestampType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))], schema
    )
    out = normalize_datetime_column(df)
    assert "datetime" in out.columns and "created" in out.columns


def test_normalize_datetime_no_temporal_raises(spark):
    with pytest.raises(ValueError, match="No datetime-typed column"):
        normalize_datetime_column(spark.createDataFrame([(1,)], ["x"]))


def test_conform_to_ohlcv_adds_symbol_and_casts(spark):
    df = spark.createDataFrame(
        [("2024-01-01 09:30:00", "1", "2", "0.5", "1.5", "100")],
        ["time", "1. open", "high px", "low px", "4. close", "volume"],
    ).withColumn("time", F.col("time").cast("timestamp"))
    out = conform_to_ohlcv(df, symbol="AAPL")
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in OHLCV_SCHEMA.fields
    ]
    row = out.first()
    assert row.symbol == "AAPL" and row.close == 1.5


def test_align_and_union_reorders_and_casts(spark):
    a = spark.createDataFrame([("X", 1.0)], ["symbol", "close"])
    b = spark.createDataFrame([(2, "Y")], ["close", "symbol"])  # int close, wrong order
    out = align_and_union([a, b])
    assert out.columns == ["symbol", "close"]
    assert dict(out.dtypes)["close"] == "double"
    assert out.count() == 2


def test_align_and_union_missing_column_raises(spark):
    a = spark.createDataFrame([("X", 1.0)], ["symbol", "close"])
    b = spark.createDataFrame([("Y",)], ["symbol"])
    with pytest.raises(ValueError, match="missing columns"):
        align_and_union([a, b])
