"""Triple-barrier event labeling — path-aware ML targets.

The reference's targets (src/features/targets.py: fixed-horizon
up/down and forward return) ignore the PATH between now and the
horizon; the triple-barrier method (Lopez de Prado, *Advances in
Financial Machine Learning*, ch. 3) labels each bar by which barrier
the price path touches FIRST — profit-take above, stop-loss below,
or the vertical (time) barrier — so the label matches how a
stop-managed position would actually resolve.

Spark-first shape: the future window is materialized as two ordered
arrays per row (``collect_list`` over a ``rowsBetween(1, horizon)``
frame — one window exchange, memory bounded by ``horizon`` per row,
never a self-join's row explosion), and the first-touch search is
pure JVM array algebra (``transform``/``filter``/``array_min``), no
Python. At 100 TB the plan is a single per-symbol window scan with
O(horizon) per-row state — the same cost envelope as the rolling
features; contrast a range self-join, which would shuffle
``horizon``x the rows.

Every comparison is on per-element IEEE products (no accumulation),
so a DuckDB oracle phrased as a range self-join computes identical
hits — the two formulations are value-identical, engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["triple_barrier_labels"]


def _first_hit(arr: Column, pred) -> Column:
    """1-based index of the first array element satisfying ``pred``
    (null if none): tag each element with its index, blank the
    misses, take the min surviving index — ordered arrays make min ==
    first."""
    tagged = F.transform(arr, lambda x, i: F.when(pred(x), i + F.lit(1)))
    return F.array_min(F.filter(tagged, lambda v: v.isNotNull()))


def triple_barrier_labels(
    df: DataFrame,
    horizon: int = 10,
    upper: float = 0.25,
    lower: float = 0.25,
    price_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
) -> DataFrame:
    """Label every bar by the first barrier its forward path touches.

    Barriers for a bar with entry price ``p``: profit-take at
    ``p * (1 + upper)`` (touched when a future bar's HIGH reaches
    it), stop-loss at ``p * (1 - lower)`` (future LOW), vertical at
    ``horizon`` bars.

    Adds four columns:

    - ``label`` — +1 profit-take first, -1 stop-loss first, 0 for
      the vertical barrier **and** for the ambiguous same-bar touch
      (both barriers inside one future bar: intra-bar order is
      unknowable from OHLC, so the honest label is neutral); null
      when fewer than ``horizon`` future bars exist (right edge —
      the min_periods convention, these rows are not labelable yet).
    - ``hit_offset`` — bars until the deciding touch (1-based; null
      for vertical/ambiguous/unlabelable).
    - ``ret_horizon`` — the plain ``horizon``-bar close return, the
      magnitude companion the 0-labels fall back on.
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    wf = w.rowsBetween(1, horizon)
    p = F.col(price_col)
    up_px = p * F.lit(1.0 + upper)
    dn_px = p * F.lit(1.0 - lower)
    # ONE struct list, not two scalar lists: collect_list silently
    # drops null ELEMENTS, so separate high/low lists would compact
    # differently when only one side is null — the first-touch
    # comparison would then compare misaligned bar offsets, and a
    # single null high would shrink the completeness count (ADVICE
    # r8). A struct element is never null even when its fields are,
    # so both barrier searches share one index space and ``complete``
    # counts BARS. A null field inside a bar simply can't witness a
    # touch (the comparison is null -> the _first_hit tag blanks).
    staged = df.withColumns(
        {
            "_fw": F.collect_list(
                F.struct(
                    F.col(high_col).alias("h"), F.col(low_col).alias("l")
                )
            ).over(wf),
            "_fc": F.lead(p, horizon).over(w),
        }
    )
    up_hit = _first_hit(F.col("_fw"), lambda x: x["h"] >= up_px)
    dn_hit = _first_hit(F.col("_fw"), lambda x: x["l"] <= dn_px)
    staged = staged.withColumns({"_up": up_hit, "_dn": dn_hit})
    u, d = F.col("_up"), F.col("_dn")
    complete = F.size(F.col("_fw")) == horizon
    label = F.when(
        complete,
        F.when(u.isNull() & d.isNull(), F.lit(0))
        .when(u.isNull(), F.lit(-1))
        .when(d.isNull(), F.lit(1))
        .when(u < d, F.lit(1))
        .when(d < u, F.lit(-1))
        .otherwise(F.lit(0)),
    ).cast("int")
    hit = F.when(
        complete & (label == 1), u
    ).when(complete & (label == -1), d).cast("int")
    ret = F.when(complete, (F.col("_fc") - p) / p)
    return (
        staged.withColumns(
            {"label": label, "hit_offset": hit, "ret_horizon": ret}
        ).drop("_fw", "_fc", "_up", "_dn")
    )
