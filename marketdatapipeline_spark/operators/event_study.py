"""Event study — average return path around detected events.

The classic empirical-finance primitive: pick an event condition
(volume spike, gap, signal fire), line every event up at offset 0,
and average returns at each relative offset — the cumulative curve
is the event's price impact signature (MacKinlay 1997, "Event
Studies in Economics and Finance").

Spark-first shape: the naive formulation is an event-to-bars range
join (every event pulls its ±k window — shuffle amplification ~2k+1
and a skew magnet when events cluster). Instead the offsets are
attached WITHOUT a join: every bar already knows, for each offset o
in [-k, +k], whether the bar ``o`` rows behind it was an event
(``lag(event, o)`` over the same symbol window that computed the
returns), so one literal-array explode + one (offset) aggregation
produces the aligned means. Cost: one window exchange + a (2k+1)x
narrow fan-out of 3-column rows — no join, no skew surface.

Decimal power sums per offset make the means engine-exact; the ±
std error shares the same sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["event_study"]

_DEC = "decimal(38,18)"


def event_study(
    df: DataFrame,
    event_col: str,
    k: int = 5,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    pooled: bool = True,
) -> DataFrame:
    """(offset, n_obs, mean_return, std_return) for offsets in
    [-k, +k] — the return at each bar relative to events flagged by
    boolean ``event_col`` (offset 0 = the event bar itself, negative
    = bars before the event).

    A bar contributes to offset ``o`` when the bar ``o`` rows EARLIER
    (same symbol) was an event; windows truncated by the series edge
    simply contribute fewer observations (``n_obs`` carries the
    denominator). ``pooled=False`` keeps the symbol column (per-
    symbol curves). ``std_return`` is the ddof=1 cross-observation
    std, null under 2 observations."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)
    p = F.col(price_col)
    ret = (p - F.lag(p).over(w)) / F.lag(p).over(w)
    ev = F.col(event_col).cast("boolean")
    staged = df.select(
        F.col(symbol_col).alias("symbol"),
        *[F.col(c) for c in order_cols],
        ret.alias("_ret"),
        ev.alias("_ev"),
    )
    # _ev_at[o] = was the bar o rows back an event?  lag(ev, o) with
    # negative o handled by lead; one window covers every shift.
    shifted = staged.withColumns(
        {
            f"_e{o}": F.lag(F.col("_ev"), o).over(
                Window.partitionBy("symbol").orderBy(*order_cols)
            )
            for o in range(-k, k + 1)
        }
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(o).alias("offset"),
                F.col(f"_e{o}").alias("hit"),
            )
            for o in range(-k, k + 1)
        ]
    )
    fan = (
        shifted.select(
            "symbol",
            "_ret",
            F.explode(pairs).alias("_p"),
        )
        .filter(F.col("_p.hit") & F.col("_ret").isNotNull())
        .select("symbol", F.col("_p.offset").alias("offset"), "_ret")
    )
    keys = ["offset"] if pooled else ["symbol", "offset"]
    g = fan.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_ret").cast(_DEC)).cast("double").alias("_s1"),
        F.sum((F.col("_ret") * F.col("_ret")).cast(_DEC))
        .cast("double")
        .alias("_s2"),
    )
    n = F.col("n_obs").cast("double")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - F.lit(1.0))
    return g.select(
        *keys,
        "n_obs",
        (F.col("_s1") / n).alias("mean_return"),
        F.when((F.col("n_obs") >= 2) & (var >= 0), F.sqrt(var)).alias(
            "std_return"
        ),
    )
