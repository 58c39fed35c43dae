"""Distributed point-in-interval range join.

Joining points ``t`` to intervals ``[s, e]`` with a raw ``BETWEEN``
predicate gives Spark no equi-key — the planner falls back to
broadcast-nested-loop (or a full cartesian partition-pair walk): the
textbook scale-killer. The standard fix is bin bucketing:

1. pick a bin width; an interval [s, e] is exploded to every bin it
   overlaps (cost: interval length / bin width replicas — bounded for
   bounded intervals);
2. a point maps to exactly ONE bin;
3. join on (key..., bin) — a plain shuffled equi-join — then apply
   the exact BETWEEN as a post-filter.

Every qualifying (point, interval) pair shares the point's bin, so
the equi-join superset is exact after filtering, and the shuffle is
hash-partitioned like any other join. Bin width trades replication
(wide bins -> fewer replicas) against join selectivity (narrow bins
-> fewer false candidates); at scale pick it near the median interval
length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(col: Column, bin_width_us: int) -> Column:
    # floor-divide epoch microseconds; works for TIMESTAMP and
    # TIMESTAMP_NTZ alike (cast is offset-consistent for both sides).
    return (F.unix_micros(col.cast("timestamp")) / F.lit(bin_width_us)).cast(
        "long"
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: tuple[str, ...] = (),
    bin_width: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (and equal ``by`` keys), as a bin-
    bucketed equi-join. ``how`` is ``"inner"`` or ``"left"`` (points
    with no containing interval kept with null interval columns).

    Interval payload columns must not collide with point columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    collide = [
        c
        for c in intervals.columns
        if c in points.columns and c not in by
    ]
    if collide:
        raise ValueError(
            f"interval column(s) {collide} already exist on the points side; "
            "rename before joining"
        )
    bin_width_us = _interval_to_us(points.sparkSession, bin_width)

    p = points.withColumn("_bin", _bin_of(F.col(point_col), bin_width_us))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _bin_of(F.col(start_col), bin_width_us),
                _bin_of(F.col(end_col), bin_width_us),
            )
        ),
    )
    on = [*by, "_bin"]
    between = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    matched = p.join(i, on=on).filter(between).drop("_bin")
    if how == "inner":
        return matched
    # left: append the points that matched nothing, with null interval
    # payload (anti-join against the matched point-row set). The
    # anti-join must be NULL-SAFE per column: with plain equality a
    # point row containing a NULL never equals itself, so it would be
    # emitted twice — once matched and once null-padded as
    # "unmatched". eqNullSafe keys still plan as a hash join.
    m = matched.select(*points.columns).distinct()
    cond = None
    for c in points.columns:
        e = points[c].eqNullSafe(m[c])
        cond = e if cond is None else cond & e
    idt = dict(intervals.dtypes)
    pad = [c for c in matched.columns if c not in points.columns]
    unmatched = points.join(m, on=cond, how="left_anti").select(
        *points.columns,
        *[F.lit(None).cast(idt[c]).alias(c) for c in pad],
    )
    return matched.unionByName(unmatched.select(*matched.columns))


def _interval_to_us(spark, text: str) -> int:
    """Parse '1 hour' / '30 minutes' style widths to microseconds via
    a SQL interval literal anchored at the epoch (one tiny driver-side
    eval, no hand parser; session timezone is UTC)."""
    row = spark.sql(
        "SELECT unix_micros(TIMESTAMP'1970-01-01 00:00:00+00:00' "
        f"+ INTERVAL '{text}')"
    ).collect()
    return int(row[0][0])
