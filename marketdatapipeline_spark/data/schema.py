"""Canonical OHLCV schema + schema-normalization utilities.

The reference infers schema and fixes it up defensively
(fuzzy OHLCV rename: reference src/data/ingestion.py:152-165;
datetime-column normalization: ingestion.py:63-104; align-and-cast
before concat: src/main.py:98-125). Here the schema is *declared* —
one table for all symbols, with an explicit ``symbol`` column — and
the fixups become DataFrame utilities.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: One row = one bar of one symbol. TimestampType is µs-precision —
#: the reference carries ns from pandas, truncated here (fine for
#: 1-minute bars; documented loss).
OHLCV_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
    ]
)

#: Candidate names for the event-time column, in priority order
#: (reference src/data/ingestion.py:70-79).
_DATETIME_CANDIDATES = ("date", "datetime", "timestamp", "time", "dt")

_OHLCV_TARGETS = ("open", "high", "low", "close", "volume")


def normalize_datetime_column(df: DataFrame, target_name: str = "datetime") -> DataFrame:
    """Find the event-time column and rename it to ``target_name``.

    Preference: a Timestamp/Date column whose name matches a known
    candidate (case-insensitive), else the first Timestamp/Date column
    (reference src/data/ingestion.py:63-104 behavior).
    """
    if target_name in df.columns:
        return df

    temporal = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType))
    ]
    if not temporal:
        raise ValueError("No datetime-typed column found to normalize")

    by_name = [c for c in temporal if c.lower() in _DATETIME_CANDIDATES]
    chosen = by_name[0] if by_name else temporal[0]
    return df.withColumnRenamed(chosen, target_name)


def fuzzy_rename_ohlcv(df: DataFrame) -> DataFrame:
    """Rename source columns containing open/high/low/close/volume.

    Handles vendor styles like Alpha Vantage's ``"1. open"``
    (reference src/data/ingestion.py:152-165). First match wins;
    already-canonical columns are left alone.
    """
    mapping: dict[str, str] = {}
    taken = set(c for c in df.columns if c in _OHLCV_TARGETS)
    for col in df.columns:
        if col in _OHLCV_TARGETS:
            continue
        low = col.lower()
        for target in _OHLCV_TARGETS:
            if target in low and target not in taken:
                mapping[col] = target
                taken.add(target)
                break
    out = df
    for old, new in mapping.items():
        out = out.withColumnRenamed(old, new)
    return out


def conform_to_ohlcv(df: DataFrame, symbol: str | None = None) -> DataFrame:
    """Cast/select a raw frame into OHLCV_SCHEMA shape.

    Combines fuzzy rename + datetime normalization + casts; adds a
    literal ``symbol`` column when the frame is single-symbol
    (the reference's dict-of-frames key becomes a column).
    """
    out = normalize_datetime_column(fuzzy_rename_ohlcv(df))
    if symbol is not None and "symbol" not in out.columns:
        out = out.withColumn("symbol", F.lit(symbol))
    cols = []
    for f in OHLCV_SCHEMA.fields:
        if f.name in out.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif f.name not in ("symbol", "datetime"):
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(f"Required column '{f.name}' missing")
    return out.select(*cols)


def align_and_union(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL frames after aligning column order and dtypes.

    The reference's defensive pre-concat loop (src/main.py:98-125):
    first frame's schema is canonical; others are reordered and cast.
    ``unionByName`` fixes ordering; explicit casts fix dtype drift.
    """
    if not dfs:
        raise ValueError("No DataFrames to union")
    head, *rest = dfs
    canon = {f.name: f.dataType for f in head.schema.fields}
    aligned = [head]
    for df in rest:
        missing = set(canon) - set(df.columns)
        if missing:
            raise ValueError(f"Cannot align: missing columns {sorted(missing)}")
        aligned.append(df.select(*[F.col(n).cast(t).alias(n) for n, t in canon.items()]))
    return reduce(DataFrame.unionByName, aligned)
