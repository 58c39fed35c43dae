"""Storage IO + path conventions + latest-file cache."""

from __future__ import annotations

import datetime as dt
import os
import time

from marketdatapipeline_spark.data.storage import (
    data_exists,
    find_latest_data_file,
    get_processed_data_path,
    get_raw_data_path,
    load_dataframe,
    save_dataframe,
)


def test_parquet_roundtrip_partitioned_by_symbol(spark, bars_df, tmp_path):
    path = str(tmp_path / "bars_pq")
    save_dataframe(bars_df, path)
    assert os.path.isdir(os.path.join(path, "symbol=AAA"))  # partition pruning layout
    back = load_dataframe(spark, path)
    assert back.count() == bars_df.count()
    assert set(back.columns) == set(bars_df.columns)


def test_csv_roundtrip(spark, bars_df, tmp_path):
    path = str(tmp_path / "bars_csv")
    save_dataframe(bars_df.select("symbol", "close"), path, format="csv", partition_by=None)
    back = load_dataframe(spark, path, format="csv")
    assert back.count() == bars_df.count()


def test_path_conventions():
    ts = dt.datetime(2024, 2, 3, 4, 5, 6)
    raw = get_raw_data_path("/base", "AAPL", "1min", timestamp=ts)
    assert raw == "/base/data/raw/AAPL_1min_20240203_040506.parquet"
    assert (
        get_processed_data_path("/base", "AAPL", "1min", suffix="features")
        == "/base/data/processed/AAPL_1min_features.parquet"
    )


def test_latest_file_cache(tmp_path):
    raw_dir = tmp_path / "data" / "raw"
    raw_dir.mkdir(parents=True)
    assert not data_exists(str(tmp_path), "AAPL", "1min")
    old = raw_dir / "AAPL_1min_20240101_000000.parquet"
    new = raw_dir / "AAPL_1min_20240201_000000.parquet"
    old.write_text("x")
    time.sleep(0.01)
    new.write_text("y")
    assert find_latest_data_file(str(tmp_path), "AAPL", "1min") == str(new)
    assert data_exists(str(tmp_path), "AAPL", "1min")
