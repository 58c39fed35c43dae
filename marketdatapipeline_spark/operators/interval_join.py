"""Distributed interval-overlap join.

Joining two interval sets on ``a.start <= b.end AND b.start <= a.end``
gives Spark no equi-key — the planner falls back to a nested-loop
walk, the same scale-killer :mod:`range_join` fixes for points. The
bin-bucketing fix extends to interval×interval with one extra idea:

1. both sides explode each interval to every bin it overlaps;
2. join on (key..., bin) — a plain shuffled equi-join — and apply the
   exact overlap predicate;
3. an overlapping pair now co-occurs in EVERY bin their spans share,
   so instead of a ``distinct`` over the (potentially wide) output,
   each pair is emitted only by its RESPONSIBILITY bin — the bin
   containing ``greatest(a.start, b.start)``. Exactly one bin
   satisfies that per pair, so the join output is duplicate-free by
   construction and the dedup costs a comparison, not a shuffle.

Replication cost is span/bin_width per row (bounded for bounded
intervals — pick the width near the median span, exactly as in
range_join); the join itself hash-partitions on (key, bin) like any
equi-join, so skew tooling (AQE) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdatapipeline_spark.operators.range_join import (
    _bin_of,
    _interval_to_us,
)

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str] = ("start", "end"),
    right_bounds: tuple[str, str] = ("start", "end"),
    by: tuple[str, ...] = (),
    bin_width: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join interval rows whose CLOSED spans overlap:
    ``l.start <= r.end AND r.start <= l.end`` (touching endpoints
    match), plus equal ``by`` keys. ``how`` is ``"inner"`` or
    ``"left"`` (left intervals overlapping nothing kept with null
    right columns — the null-safe anti-join recovery
    :func:`point_in_interval_join` uses). Column names (outside
    ``by``) must not collide across the two sides."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    ls, le = left_bounds
    rs, re = right_bounds
    collide = [
        c for c in right.columns if c in left.columns and c not in by
    ]
    if collide:
        raise ValueError(
            f"right column(s) {collide} already exist on the left side; "
            "rename before joining"
        )
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError(
            "column name _bin is reserved by interval_overlap_join; "
            "rename before joining"
        )
    bw = _interval_to_us(left.sparkSession, bin_width)

    def exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(_bin_of(F.col(s), bw), _bin_of(F.col(e), bw))
            ),
        )

    l = exploded(left, ls, le)
    r = exploded(right, rs, re)
    overlap = (F.col(ls) <= F.col(re)) & (F.col(rs) <= F.col(le))
    # responsibility: only the bin holding the later of the two starts
    # emits the pair — exactly one bin per overlapping pair, so no
    # distinct is needed afterwards
    responsible = F.col("_bin") == _bin_of(
        F.greatest(F.col(ls).cast("timestamp"), F.col(rs).cast("timestamp")),
        bw,
    )
    matched = (
        l.join(r, on=[*by, "_bin"])
        .filter(overlap & responsible)
        .drop("_bin")
    )
    if how == "inner":
        return matched
    # left: append left intervals that matched nothing, null-padded.
    # The anti-join is NULL-SAFE per column (plain equality would emit
    # a null-bearing left row twice — matched AND "unmatched").
    m = matched.select(*left.columns).distinct()
    cond = None
    for c in left.columns:
        e = left[c].eqNullSafe(m[c])
        cond = e if cond is None else cond & e
    rdt = dict(right.dtypes)
    pad = [c for c in matched.columns if c not in left.columns]
    unmatched = left.join(m, on=cond, how="left_anti").select(
        *left.columns,
        *[F.lit(None).cast(rdt[c]).alias(c) for c in pad],
    )
    return matched.unionByName(unmatched.select(*matched.columns))
