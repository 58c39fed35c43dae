"""Distributed as-of (point-in-time) join.

The canonical market-data operator — attach to each left row (a
trade) the most recent right row (a quote) at or before its
timestamp, per key. Spark has no native ASOF JOIN; the classic
range-join formulation explodes into an inequality join. This
implementation is the union-and-carry composition:

1. union both sides into one frame, right rows carrying their entire
   payload as ONE struct column, left rows carrying a null struct;
2. one window per key, ordered by (time, side) with right-before-left
   at equal timestamps (inclusive ``<=`` semantics);
3. ``last(struct, ignorenulls=True)`` over the unbounded-preceding
   frame carries the latest right row forward onto each left row.

The single-struct carry is a correctness property, not a convenience:
with one ``last(col, ignorenulls=True)`` PER payload column, a right
row whose payload column is legitimately NULL would have that one
column filled from an OLDER right row — a frankenrow mixing payloads
across right rows. The struct is non-null exactly for right rows, so
every attached payload (and the match time used by ``tolerance``)
comes from the same matched right row; a NULL payload field on the
matched row surfaces as NULL, exactly as a real join would return it.

Cost: ONE shuffle on the key (the window exchange) regardless of how
many right rows precede each left row — no range explosion, no
per-row search. This is the plan that survives 100 TB: both sides
hash-partition by key, the per-key sort is Spark's normal window
sort, and skewed keys fall to AQE.

Semantics match DuckDB's native ``ASOF LEFT JOIN`` (the correctness
oracle): unmatched left rows keep nulls, equal timestamps match
(backward: ``right.ts <= left.ts``), and ``tolerance`` nulls out
matches older than the given interval (pandas ``merge_asof``
convention).

The right side must be unique per (key, time) — as-of against a
multi-valued time is ill-defined. Callers aggregate first (e.g.
``max_by`` a deterministic tie-break column); uniqueness is NOT
verified here (a full pre-count would double the cost) — it is the
caller's documented contract, as in pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = ("symbol",),
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the payload of the
    nearest ``right`` row at-or-before (``backward``) or at-or-after
    (``forward``) its ``on`` time, matched within ``by`` groups.

    Right payload columns (everything but ``on``/``by``) are appended
    under their own names and must not collide with left columns.
    ``tolerance`` (e.g. ``F.expr("INTERVAL 5 MINUTES")``) nulls the
    payload when the matched right row is further away than the
    interval.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    key_cols = [on, *by]
    payload = [c for c in right.columns if c not in key_cols]
    collide = [c for c in payload if c in left.columns]
    if collide:
        raise ValueError(
            f"right payload column(s) {collide} already exist on the left; "
            "rename before joining"
        )
    if not payload:
        raise ValueError("right side has no payload columns to attach")
    # Internal names: _side/_pay tag the union frame, _r_on rides inside
    # the payload struct. An input column with one of these names would
    # silently collide (duplicate struct field, ambiguous getField).
    reserved = {"_side", "_pay", "_r_on"}
    bad = sorted(reserved & set(left.columns) | reserved & set(right.columns))
    if bad:
        raise ValueError(
            f"column name(s) {bad} are reserved by asof_join internals; "
            "rename before joining"
        )

    # Side marker orders right rows before left rows at equal time for
    # backward (so an equal-timestamp quote is visible), after for
    # forward — mirrored by the descending sort below. Each side is a
    # single select (flat analyzer cost however wide the payload).
    rdt, ldt = dict(right.dtypes), dict(left.dtypes)

    def bq(name: str) -> str:
        # DDL backtick-quoting: literal backticks double inside quotes.
        return "`" + name.replace("`", "``") + "`"

    pay_type = (
        "struct<"
        + ",".join(
            [f"{bq(c)}:{rdt[c]}" for c in payload] + [f"`_r_on`:{rdt[on]}"]
        )
        + ">"
    )
    lhs = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    rhs = right.select(
        # Left columns absent on the right ride as nulls through the union.
        *[
            F.col(c) if c in key_cols else F.lit(None).cast(ldt[c]).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c) for c in payload], F.col(on).alias("_r_on")
        ).alias("_pay"),
    )
    tagged = lhs.unionByName(rhs)

    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col("_side").asc())
    else:
        w = Window.partitionBy(*by).orderBy(F.col(on).desc(), F.col("_side").asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = tagged.select(
        *left.columns,
        F.col("_side"),
        F.last("_pay", ignorenulls=True).over(w).alias("_pay"),
    )
    matched = carried.filter(F.col("_side") == 1)
    pay = F.col("_pay")
    if tolerance is not None:
        r_on = pay.getField("_r_on")
        gap = (
            F.col(on) - r_on if direction == "backward" else r_on - F.col(on)
        )
        pay = F.when(r_on.isNotNull() & (gap <= tolerance), pay)
    return matched.select(
        *left.columns,
        *[pay.getField(c).alias(c) for c in payload],
    )
