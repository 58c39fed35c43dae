"""Storage: parquet/CSV IO + path conventions + latest-file cache.

Re-expresses reference src/data/storage.py (save/load at 60-111, path
conventions at 11-57, cache lookup at 114-152) for Spark writers.
Single-file semantics of Polars become directory-per-dataset semantics
of Spark; at scale, datasets are partitioned by ``symbol`` so that
per-symbol reads prune partitions at the source.
"""

from __future__ import annotations

import glob
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def save_dataframe(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: str | list[str] | None = "symbol",
) -> None:
    """Write a dataset (reference src/data/storage.py:60-83).

    Partitioning by symbol mirrors the reference's file-per-symbol
    layout and gives partition pruning on per-symbol queries.
    """
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        present = [c for c in cols if c in df.columns]
        if present:
            writer = writer.partitionBy(*present)
    if format == "parquet":
        writer.parquet(path)
    elif format == "csv":
        writer.option("header", True).csv(path)
    elif format == "json":
        # JSON Lines — one object per line, the interchange format of
        # text/training-data pipelines. Splittable uncompressed, so a
        # 100 TB drop still parallelizes at the source.
        writer.json(path)
    else:
        raise ValueError(f"Unsupported format: {format}")


def load_dataframe(
    spark: SparkSession,
    path: str,
    format: str | None = None,
    schema=None,
) -> DataFrame:
    """Read a dataset; format inferred from suffix when omitted
    (reference src/data/storage.py:86-111)."""
    if format is None:
        tail = path.rstrip("/")
        if tail.endswith(".csv"):
            format = "csv"
        elif tail.endswith((".json", ".jsonl")):
            format = "json"
        else:
            format = "parquet"
    if format == "parquet":
        return spark.read.parquet(path)
    if format == "csv":
        reader = spark.read.option("header", True)
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        return reader.csv(path)
    if format == "json":
        # Explicit schema skips the full inference pre-scan (a second
        # read of the entire dataset) — always pass one at scale.
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    raise ValueError(f"Unsupported format: {format}")


def get_raw_data_path(
    base_dir: str,
    symbol: str,
    interval: str,
    format: str = "parquet",
    timestamp: datetime | None = None,
) -> str:
    """``{base}/data/raw/{symbol}_{interval}_{YYYYMMDD_HHMMSS}.{fmt}``
    (reference src/data/storage.py:11-34)."""
    ts = (timestamp or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    return os.path.join(base_dir, "data", "raw", f"{symbol}_{interval}_{ts}.{format}")


def get_processed_data_path(
    base_dir: str,
    symbol: str,
    interval: str,
    format: str = "parquet",
    suffix: str = "",
) -> str:
    """``{base}/data/processed/{symbol}_{interval}{_suffix}.{fmt}``
    (reference src/data/storage.py:37-57)."""
    sfx = f"_{suffix}" if suffix else ""
    return os.path.join(
        base_dir, "data", "processed", f"{symbol}_{interval}{sfx}.{format}"
    )


def find_latest_data_file(
    base_dir: str, symbol: str, interval: str, format: str = "parquet"
) -> str | None:
    """Newest cached raw dataset by mtime, or None
    (reference src/data/storage.py:114-137)."""
    pattern = os.path.join(base_dir, "data", "raw", f"{symbol}_{interval}_*.{format}")
    matches = glob.glob(pattern)
    if not matches:
        return None
    return max(matches, key=os.path.getmtime)


def data_exists(base_dir: str, symbol: str, interval: str, format: str = "parquet") -> bool:
    """Cache existence check (reference src/data/storage.py:140-152)."""
    return find_latest_data_file(base_dir, symbol, interval, format) is not None


def save_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int = 32,
    bucket_cols: str | list[str] = "symbol",
    sort_cols: str | list[str] | None = "datetime",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a BUCKETED table — the 100 TB co-location tool.

    ``bucketBy`` hashes rows into a fixed bucket count at write time
    and records the layout in the catalog; joins and aggregations on
    the bucket key between tables with matching bucket specs then run
    WITHOUT a shuffle (the scan is already hash-distributed — the
    plan audit in tests/test_plans.py pins this). ``sortBy`` orders
    within buckets so window stages start pre-sorted.

    Bucketed output must go through ``saveAsTable`` (plain
    path-writers cannot record the bucket spec); the table lands in
    the session's warehouse directory — set
    ``spark.sql.warehouse.dir`` to place it.
    """
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(buckets, *bcols)
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*scols)
    if path is not None:
        writer = writer.option("path", path)  # external table, same spec
    writer.format("parquet").saveAsTable(table_name)


def load_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``read.parquet`` of the files would silently DROP the bucketing
    metadata and reintroduce shuffles)."""
    return spark.table(table_name)
