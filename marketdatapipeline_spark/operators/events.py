"""Product-analytics operators over event streams — sequential
funnels and cohort retention, the two queries every event table gets
asked first.

Both are one-shuffle shapes:

- :func:`funnel` groups each user's per-step timestamps into sorted
  arrays (ONE groupBy(user) aggregation), resolves the strictly-
  sequential first-touch chain scan-side with array algebra
  (``array_min(filter(...))`` — no per-step self-joins, which is how
  naive funnel SQL goes quadratic in steps), then folds the tiny
  per-user rows into per-step totals.
- :func:`cohort_retention` derives each user's cohort period (first
  activity) and the distinct periods they were active — two
  map-side-combinable aggregations and a broadcast-size cohort
  table.

Counts are integers, rates integer-ratio divisions, period offsets
exact epoch arithmetic — the whole surface is engine-exact
(UNROUNDED oracle territory except the libm-free medians, which are
exact interpolated percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohort_retention", "funnel"]


def funnel(
    df: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """(step, step_name, n_users, conv_from_prev, conv_from_first,
    median_seconds_from_prev): the strictly-sequential funnel — a
    user reaches step k only via the FIRST step-k event that is
    strictly after their step-(k-1) arrival time (first-touch
    attribution; re-orderings don't count).

    ``median_seconds_from_prev`` is the exact interpolated median of
    the per-user step transition time (null for step 1 and for steps
    nobody reached)."""
    if len(steps) < 2:
        raise ValueError(f"need >= 2 funnel steps, got {steps!r}")
    arrs = [
        F.sort_array(
            F.collect_list(
                F.when(F.col(type_col) == s, F.col(time_col))
            )
        ).alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(F.col(user_col)).agg(*arrs)
    ts_cols = {}
    prev = None
    for i in range(len(steps)):
        arr = F.col(f"_a{i}")
        if prev is None:
            # try_ variant: ANSI mode errors on empty arrays, and a
            # user with zero step-1 events is an ordinary miss
            t = F.try_element_at(arr, F.lit(1))
        else:
            t = F.when(
                prev.isNotNull(),
                F.array_min(F.filter(arr, lambda x: x > prev)),
            )
        ts_cols[f"_t{i}"] = t
        prev = F.col(f"_t{i}")
    reached = per_user.withColumns(ts_cols)
    aggs = []
    for i in range(len(steps)):
        t = F.col(f"_t{i}")
        aggs.append(F.count(t).alias(f"_n{i}"))
        if i > 0:
            # events.ts reads as TIMESTAMP_NTZ from some parquet
            # sources; cast for unix_micros — the DIFFERENCE is
            # timezone-invariant either way
            gap = (
                F.unix_micros(t.cast("timestamp"))
                - F.unix_micros(F.col(f"_t{i-1}").cast("timestamp"))
            ).cast("double") / F.lit(1e6)
            aggs.append(
                F.percentile(gap, F.lit(0.5)).alias(f"_med{i}")
            )
    totals = reached.agg(*aggs)
    rows = []
    for i, s in enumerate(steps):
        n = F.col(f"_n{i}").cast("long")
        n_prev = F.col(f"_n{i-1}").cast("double") if i > 0 else None
        n_first = F.col("_n0").cast("double")
        rows.append(
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                n.alias("n_users"),
                (
                    F.when(n_prev > 0, n.cast("double") / n_prev)
                    if i > 0
                    else F.lit(None).cast("double")
                ).alias("conv_from_prev"),
                F.when(n_first > 0, n.cast("double") / n_first).alias(
                    "conv_from_first"
                ),
                (
                    F.col(f"_med{i}") if i > 0 else F.lit(None).cast("double")
                ).alias("median_seconds_from_prev"),
            )
        )
    return totals.select(
        F.explode(F.array(*rows)).alias("_r")
    ).select("_r.*")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, period_offset, n_active, cohort_size, retention):
    the classic retention triangle — users bucketed by the period of
    their FIRST activity, then counted per period offset they were
    active in (offset 0 = the cohort period itself, retention 1.0 by
    construction).

    ``period`` is any ``date_trunc`` unit; the offset is exact
    integer arithmetic on epoch microseconds for fixed-width units
    (``week``/``day``/``hour``) — month-grain would need interval
    algebra and is rejected."""
    widths = {
        "day": 86_400_000_000,
        "hour": 3_600_000_000,
        "week": 604_800_000_000,
    }
    if period not in widths:
        raise ValueError(
            f"period must be one of {sorted(widths)}, got {period!r}"
        )
    width = widths[period]
    p = F.date_trunc(period, F.col(time_col))
    activity = df.select(
        F.col(user_col).alias("_u"), p.alias("_p")
    ).distinct()
    cohorts = activity.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    sizes = cohorts.groupBy("_cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = activity.join(cohorts, "_u")
    offset = (
        (
            F.unix_micros(F.col("_p").cast("timestamp"))
            - F.unix_micros(F.col("_cohort").cast("timestamp"))
        )
        / F.lit(width)
    ).cast("long")
    act = joined.groupBy(
        F.col("_cohort"), offset.alias("period_offset")
    ).agg(F.count(F.lit(1)).alias("n_active"))
    out = act.join(sizes, "_cohort")
    return out.select(
        F.col("_cohort").alias("cohort"),
        "period_offset",
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )
