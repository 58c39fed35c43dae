"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship feature pipeline on sf0.001;
``queries``/``oracle_sql`` expose the operator catalog
(marketdatapipeline_spark/catalog.py) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _configure(spark: SparkSession) -> SparkSession:
    # events.ts is parquet TIMESTAMP(NANOS); see sources/tables.py
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full 50-feature pipeline + fused target on sf0.001 bars."""
    _configure(spark)
    from marketdatapipeline_spark.features import compute_all_features
    from marketdatapipeline_spark.sources import bars_from_events

    bars = bars_from_events(spark, "/root/testdata/sf0.001")
    return compute_all_features(
        bars, order_cols=("datetime", "bar_id"), target_horizon=1
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_operators  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401 — registers
    from marketdatapipeline_spark.catalog import ordered_registry

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_operators  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401 — registers
    from marketdatapipeline_spark.catalog import ordered_registry

    return {
        name: spec.sql
        for name, spec in ordered_registry().items()
        if spec.sql is not None
    }


# --------------------------------------------------------------------------
# Beyond the driver contract: the post-gate extended catalog
# (corpus-preparation operators). Not part of queries()/oracle_sql()
# because the external 50-query gate is full and its exempt tail is
# frozen; every entry is instead value-checked cell-exactly against
# DuckDB on each pytest run (tests/test_corpus_oracle.py). Exposed
# here with the same shapes so a harness (or reviewer) can run them
# identically.
# --------------------------------------------------------------------------


def extended_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_operators  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401 — registers
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in EXTENDED_REGISTRY.items()}


def extended_oracle_sql() -> dict[str, str]:
    import marketdatapipeline_spark.catalog_corpus  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_multimodal  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_operators  # noqa: F401 — registers
    import marketdatapipeline_spark.catalog_pipeline  # noqa: F401 — registers
    from marketdatapipeline_spark.catalog import EXTENDED_REGISTRY

    return {
        name: spec.sql
        for name, spec in EXTENDED_REGISTRY.items()
        if spec.sql is not None
    }
