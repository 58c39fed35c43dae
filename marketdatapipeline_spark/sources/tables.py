"""Loaders for the driver's synthetic parquet tables + bars derivation.

``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as a long
(``spark.sql.legacy.parquet.nanosAsLong``) and we convert with integer
division ``div 1000`` — exact, and identical to DuckDB's ns→µs
truncation, so the SQL oracle sees the same microsecond values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; normalizes events.ts to TimestampType."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def bars_from_events(
    spark: SparkSession, sf_dir: str, n_symbols: int = 10
) -> DataFrame:
    """Derive an OHLCV-shaped bars table from ``events`` (FIXTURES.md §1).

    The driver ships no native bars table, so feature-operator queries
    and their DuckDB oracles both build this view: symbol buckets from
    ``user_id % n_symbols``, event time as bar time, ``value`` as close,
    high/low displaced by exactly ±1.0 (exact FP in any engine), and
    ``bar_id`` kept as a deterministic tie-breaker for ordering.
    """
    ev = load_table(spark, sf_dir, "events")
    # +100 keeps close bounded away from zero so return/vol magnitudes
    # stay O(1)-O(1e3) and 6-decimal rounding dwarfs cross-engine FP
    # association error at any scale factor.
    return ev.select(
        (F.col("user_id") % n_symbols).cast("string").alias("symbol"),
        F.col("ts").alias("datetime"),
        F.col("event_id").alias("bar_id"),
        (F.col("value") + F.lit(100.0)).alias("open"),
        (F.col("value") + F.lit(101.0)).alias("high"),
        (F.col("value") + F.lit(99.0)).alias("low"),
        (F.col("value") + F.lit(100.0)).alias("close"),
        ((F.col("event_id") % 1000) + F.lit(1)).cast("double").alias("volume"),
    )


#: SQL fragment building the same bars view in DuckDB for oracles.
#: Must stay semantically identical to bars_from_events.
BARS_ORACLE_CTE = """
bars AS (
    SELECT CAST(user_id % {n_symbols} AS VARCHAR) AS symbol,
           ts AS datetime,
           event_id AS bar_id,
           value + 100.0 AS open,
           value + 101.0 AS high,
           value + 99.0 AS low,
           value + 100.0 AS close,
           CAST((event_id % 1000) + 1 AS DOUBLE) AS volume
    FROM events
)
"""


def bars_oracle_cte(n_symbols: int = 10) -> str:
    return BARS_ORACLE_CTE.format(n_symbols=n_symbols)


def register_views(
    spark: SparkSession, sf_dir: str, include_bars: bool = True
) -> list[str]:
    """Register every synthetic table (plus the derived ``bars`` view)
    as temp views, so the full catalog surface is reachable from plain
    ``spark.sql(...)`` — the SQL front door for users who think in
    queries rather than the DataFrame API. Returns the view names.

    Views are lazy: nothing scans until a query runs, and Catalyst
    pushes filters/prunes columns through them exactly as through the
    DataFrame forms (same plans, pinned in tests)."""
    names = []
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        names.append(name)
    if include_bars:
        bars_from_events(spark, sf_dir).createOrReplaceTempView("bars")
        names.append("bars")
    return names
