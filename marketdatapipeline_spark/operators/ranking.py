"""Distributed global ranking — ``row_number() OVER (ORDER BY ...)``
without the single-task window.

A global ORDER BY window (``Window.partitionBy(lit(1))``) funnels the
entire table through ONE task: correct at catalog scale, a wall at
100 TB. The classic distributed rank replaces it:

1. ``repartitionByRange`` on the rank order — ranges are disjoint and
   ordered across partitions (Spark's RangePartitioner maps equal keys
   to one partition, so ties never straddle a boundary);
2. per-partition counts collect to the driver (ONE row per partition —
   a scalar-probe-sized collect, same budget as an AQE stat);
3. each partition ranks locally (``row_number`` over the partition id)
   and adds its prefix offset.

The result is bit-identical to the single-task window for a total
order (callers must include a tiebreak column, exactly as they must
for the window version to be deterministic).

The repartitioned frame is scoped-persisted: the count pass and the
rank pass must see the same layout, and RangePartitioner's boundary
sampling is seeded per-plan — two un-cached executions could
legitimately sample different bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marketdatapipeline_spark.caching import scoped_persist

__all__ = ["global_row_number"]


def global_row_number(
    df: DataFrame,
    *order: Column | str,
    out_col: str = "rk",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus a dense 1-based global row number ``out_col`` under
    the total order ``order`` (include a unique tiebreak column —
    same determinism contract as a window ``row_number``). When
    ``total_col`` is given, the total row count rides along as an
    extra column (it falls out of the offset pass for free — callers
    computing quantile buckets need it and would otherwise pay a
    ``count(*) OVER ()`` global window)."""
    if not order:
        raise ValueError("global_row_number needs at least one order column")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = scoped_persist(
        df.repartitionByRange(n, *order).withColumn(
            "_gpid", F.spark_partition_id()
        )
    )
    counts = {
        r["_gpid"]: r["cnt"]
        for r in d.groupBy("_gpid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(
        *[F.lit(v) for kv in sorted(offsets.items()) for v in kv]
    )
    w = Window.partitionBy("_gpid").orderBy(*order)
    out = d.withColumn(
        out_col,
        (F.row_number().over(w) + omap[F.col("_gpid")]).cast("long"),
    ).drop("_gpid")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("long"))
    return out
