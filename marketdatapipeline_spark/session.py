"""SparkSession factory tuned for this engine.

Single place where execution knobs live so tests, bench, and the driver
contract all run with identical settings: AQE on (runtime re-planning,
skew-join mitigation, partition coalescing), Arrow on (fast
pandas-UDF / toPandas boundary), UTC session timezone (bit-identical
timestamp semantics vs the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "marketdatapipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    In local mode there is one JVM; ``local[N]`` threads stand in for
    executors. The partitioning discipline (hash by symbol, sort by
    datetime within partitions) is what carries to a real cluster —
    nothing here assumes single-node.
    """
    cpus = os.getenv("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.getenv("MDP_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # testdata's events.ts is parquet TIMESTAMP(NANOS); Spark has no
        # ns timestamp — read as long, convert in sources.tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
