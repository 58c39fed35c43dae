"""Single-pass table profiling — the data-quality audit a pipeline
runs before/after every ingest: per-column null counts, distinct
cardinality, and numeric range/mean, as ONE aggregation job.

Plan shape: every metric for every column is computed inside a single
``agg`` (one scan, map-side combinable; ``count_distinct`` expands to
one expand-node pass), and the one-row result unpivots JVM-side
(``stack``) into the (column, metrics) rows a report wants. No
driver-side loop over columns, no per-column jobs — profiling a
100 TB table costs one pass regardless of column count.

Numeric columns carry min/max/mean (mean over ``decimal(28,10)`` so
the value is engine-exact under the oracle); other types profile
nulls/distincts only (cross-engine min/max STRING formatting of
timestamps is not stable, and a string min/max is rarely the audit
anyone wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value,
    mean_value): one row per profiled column; the numeric metrics are
    null for non-numeric columns. ``n_distinct`` is exact and counts
    non-null values (count_distinct semantics)."""
    columns = list(columns or df.columns)
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"column(s) {missing} not present")
    types = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        aggs.append(
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"_nn_{i}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{i}"))
        if isinstance(types[c], NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mi_{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_ma_{i}"))
            aggs.append(
                (
                    F.sum(F.col(c).cast("decimal(28,10)")).cast("double")
                    / F.count(F.col(c))
                ).alias(f"_me_{i}")
            )
    one = df.agg(*aggs)

    cells = []
    for i, c in enumerate(columns):
        cells.append(f"'{c}'")
        cells.append("_n")
        cells.append(f"_nn_{i}")
        cells.append(f"_nd_{i}")
        if isinstance(types[c], NumericType):
            cells += [f"_mi_{i}", f"_ma_{i}", f"_me_{i}"]
        else:
            cells += [
                "CAST(NULL AS DOUBLE)",
                "CAST(NULL AS DOUBLE)",
                "CAST(NULL AS DOUBLE)",
            ]
    stack = (
        f"stack({len(columns)}, {', '.join(cells)}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value, "
        "mean_value)"
    )
    return one.selectExpr(stack)
