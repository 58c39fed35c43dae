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

__all__ = ["profile_columns", "validate_rules"]


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


def validate_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality validation: evaluate every rule in ONE
    aggregation pass (one scan regardless of rule count — the
    expectation-suite shape at 100 TB) and return one row per rule:
    ``(rule, check_type, column_name, n_rows, n_violations,
    violation_rate, passed)``.

    Each rule is a dict: ``name`` (report label), ``check`` (one of
    the kinds below), and its parameters:

    - ``not_null``: ``column`` — violation = null value
    - ``unique``:   ``column`` — violations = non-null rows beyond the
      first occurrence of each value (``count(col) - count_distinct``)
    - ``range``:    ``column``, optional ``min``/``max`` — violation =
      non-null value outside the closed interval (nulls are not range
      violations; pair with ``not_null`` to forbid them)
    - ``in_set``:   ``column``, ``values`` — violation = non-null
      value outside the set
    - ``matches``:  ``column``, ``pattern`` — violation = non-null
      value NOT matching the (unanchored, Java-regex/RE2
      common-subset) pattern
    - ``expr``:     ``expr`` — a boolean SQL expression over the
      row; violation = rows where it is false OR null (a null check
      result is a failed check, the conservative reading)

    All counters are conditional counts (map-side combinable); the
    ``unique`` rules add exact distinct counts to the same single agg.
    ``violation_rate`` divides two exact integers — engine-exact.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    cells: list[str] = []
    for i, rule in enumerate(rules):
        check = rule["check"]
        col = rule.get("column")
        if check == "unique":
            aggs.append(F.count(F.col(col)).alias(f"_nn_{i}"))
            aggs.append(F.count_distinct(F.col(col)).alias(f"_nd_{i}"))
            viol = f"_nn_{i} - _nd_{i}"
        else:
            if check == "not_null":
                cond = F.col(col).isNull()
            elif check == "range":
                c = F.col(col)
                bounds = []
                if rule.get("min") is not None:
                    bounds.append(c < F.lit(rule["min"]))
                if rule.get("max") is not None:
                    bounds.append(c > F.lit(rule["max"]))
                if not bounds:
                    raise ValueError(f"range rule {rule.get('name')!r} needs min and/or max")
                out_of = bounds[0] if len(bounds) == 1 else bounds[0] | bounds[1]
                cond = c.isNotNull() & out_of
            elif check == "in_set":
                c = F.col(col)
                cond = c.isNotNull() & ~c.isin(*rule["values"])
            elif check == "matches":
                c = F.col(col)
                cond = c.isNotNull() & ~c.rlike(rule["pattern"])
            elif check == "expr":
                ok = F.expr(rule["expr"])
                cond = ~F.coalesce(ok, F.lit(False))
            else:
                raise ValueError(f"unknown check kind: {check!r}")
            aggs.append(F.count(F.when(cond, 1)).alias(f"_v_{i}"))
            viol = f"_v_{i}"
        name = rule.get("name") or f"rule_{i}"
        cells += [
            "'" + name.replace("'", "''") + "'",
            f"'{check}'",
            ("'" + col + "'") if col else "CAST(NULL AS STRING)",
            "_n",
            f"CAST({viol} AS BIGINT)",
        ]
    one = df.agg(*aggs)
    stack = (
        f"stack({len(rules)}, {', '.join(cells)}) AS "
        "(rule, check_type, column_name, n_rows, n_violations)"
    )
    return one.selectExpr(stack).withColumns(
        {
            "violation_rate": F.col("n_violations").cast("double")
            / F.col("n_rows"),
            "passed": F.col("n_violations") == 0,
        }
    )
