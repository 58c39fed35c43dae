"""Pairwise return correlation — the sample correlation of simple
returns between every pair of symbols, the input to covariance-based
portfolio construction and regime monitoring.

Alignment: event timestamps are irregular and per-symbol, so series
align on the per-symbol BAR INDEX (row_number over the symbol's own
order) — index i of symbol A pairs with index i of symbol B; the pair
length is the shorter series. This is the dense, gap-free alignment;
calendar alignment is ``resample_ffill`` composed in front.

Plan shape (r8 pre-pivot + prefix decomposition): one window exchange
for (return, index), then ONE groupBy(_idx) that pivots each bar
index into a single row carrying an array of (symbol, return)
structs, and a narrow upper-triangle explode (array_sort + posexplode
+ slice) into exactly the symbol_a < symbol_b pairs — the r7
self-join on _idx is gone, so each return crosses the _idx exchange
ONCE instead of twice. At lag 0 only the CROSS term sum(ra·rb) is
aggregated from pair rows; the per-symbol sums come from per-symbol
prefix sums looked up at each pair's length via two broadcast joins
(see ``_corr_lag0_prefix``) — 5x less per-pair decimal arithmetic. A
nonzero lag joins two pre-pivoted one-row-per-index tables (~N/S
rows each), not the N-row return tables, and keeps the full
five-sum pair aggregation. The pair explosion (S·(S-1)/2 rows per
index — pairwise correlation IS quadratic in symbols) happens inside
the stage, where map-side partial aggregation collapses it before
the final pair exchange. Co-moments accumulate as ``decimal(38,18)``
sums (association-free AND exact, so any engine, any collect_list
order, and the prefix-vs-direct grouping all agree bit-for-bit); the
correlation itself is assembled driver-free from the five sums with
identically-ordered scalar double arithmetic:

    corr = (n·sxy - sx·sy) / sqrt((n·sxx - sx²)·(n·syy - sy²))

null when either variance term is <= 0 (a constant series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bar_index_returns", "pairwise_return_correlation"]


def bar_index_returns(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    decimal_prefix: str | None = None,
) -> DataFrame:
    """(_sym, _idx, _ret): simple returns with the per-symbol bar
    index — the aligned-series building block this module and
    :mod:`beta` share.

    The index is assigned AFTER dropping null returns (the first bar,
    and any null-price gaps), so per-symbol indexes are contiguous
    from 1 by construction. That contiguity is a load-bearing
    invariant: the lag-0 correlation derives each pair's per-symbol
    sums from prefix sums at the pair length (r8), which is only the
    right subset when index k always means "the symbol's first k
    returns". For null-free series this matches the r7 pre-filter
    indexing shifted uniformly by one (identical alignment); with
    mid-series null prices the series compacts — the dense alignment
    the module docstring promises — instead of carrying holes.

    Both window functions share one (symbol) exchange: the alias
    projection happens BEFORE the first window so both key on the
    same ``_sym`` attribute — keying the first on the original column
    and the second on its alias planned a second exchange (the r7
    aliased-key lesson, pinned in test_plans).

    ``decimal_prefix`` (r10): when set to a decimal type string, the
    running prefix sums ``_cs`` = Σret and ``_css`` = Σret² (exact
    decimal, per symbol, ordered by index) ride along IN THE SAME
    window stage. The correlation paths used to derive them in a
    second pass over ``rets``, which recomputed the whole
    bars-scan + window chain — fusing them here makes one pass feed
    both the pair aggregation and the boundary lookups."""
    base = df.select(
        F.col(symbol_col).alias("_sym"),
        *[F.col(c) for c in order_cols],
        F.col(price_col).alias("_p"),
    )
    w = Window.partitionBy("_sym").orderBy(*order_cols)
    prev = F.lag(F.col("_p")).over(w)
    rets = base.select(
        "_sym",
        *[F.col(c) for c in order_cols],
        ((F.col("_p") - prev) / prev).alias("_ret"),
    ).filter(F.col("_ret").isNotNull())
    cols = ["_sym", F.row_number().over(w).alias("_idx"), F.col("_ret")]
    if decimal_prefix is not None:
        wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cols += [
            F.sum(F.col("_ret").cast(decimal_prefix)).over(wf).alias("_cs"),
            F.sum((F.col("_ret") * F.col("_ret")).cast(decimal_prefix))
            .over(wf)
            .alias("_css"),
        ]
    return rets.select(*cols)


def _corr_lag0_prefix(
    rets: DataFrame, min_obs: int, dec: str
) -> DataFrame:
    """Lag-0 pairwise correlation via the r8 prefix-sum decomposition.

    Only the CROSS term sum(ra·rb) genuinely needs pair rows; the
    per-symbol terms sum(ra), sum(ra²) over a pair's aligned range
    [1, n_obs] are PREFIX sums of that symbol's own return series —
    decimal addition is exact, so the running-window sum at index
    n_obs is bit-identical to summing the same elements any other way
    (which is why the DuckDB oracle can keep its direct per-pair sums
    unchanged). That cuts the pair-row decimal work from five sums to
    one: ~2x faster at sf0.1 and 5x less per-pair decimal arithmetic
    at any scale.

    Valid because ``bar_index_returns`` indexes post-filter, so index
    k == "the symbol's first k returns" (contiguity by construction)
    and a pair's aligned count n_obs == min(len_a, len_b).

    Plan: window exchange (symbol) -> index pivot exchange ->
    upper-triangle explode (array_sort + posexplode + slice emits
    exactly the symbol_a < symbol_b pairs) -> ONE decimal sum per
    pair; the tiny pair table then broadcast-joins back to the
    prefix-sum rows at each pair's boundary index. ``rets`` arrives
    persisted WITH its fused ``_cs``/``_css`` prefix columns
    (bar_index_returns decimal_prefix), so the pair chain and the
    boundary lookup read one cached pass instead of recomputing the
    bars-scan + window chain twice (r10)."""
    entry = F.collect_list(F.struct("_sym", "_ret"))
    sorted_e = rets.groupBy("_idx").agg(
        F.array_sort(entry).alias("_ea")
    )
    # explicit repartition BEFORE the pair explode: the pivoted table
    # is tiny in bytes (AQE would coalesce it to one partition) but
    # each row fans out to S(S-1)/2 pair rows — the CPU-heavy explode
    # must spread across the executors, not serialize on one task.
    # AQE honors a user-specified partition count.
    spark = rets.sparkSession
    sorted_e = sorted_e.repartition(
        spark.sparkContext.defaultParallelism, "_idx"
    )
    pairs = (
        sorted_e.select(
            F.posexplode("_ea").alias("_i", "_a"), F.col("_ea")
        )
        .select(
            F.col("_a._sym").alias("symbol_a"),
            F.col("_a._ret").alias("_ra"),
            F.explode(
                F.slice("_ea", F.col("_i") + F.lit(2), F.size("_ea"))
            ).alias("_b"),
        )
        .select(
            "symbol_a",
            F.col("_b._sym").alias("symbol_b"),
            "_ra",
            F.col("_b._ret").alias("_rb"),
        )
    )
    g = pairs.groupBy("symbol_a", "symbol_b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum((F.col("_ra") * F.col("_rb")).cast(dec))
        .cast("double")
        .alias("_sxy"),
    ).filter(F.col("n_obs") >= min_obs)

    pre = rets.select("_sym", "_idx", "_cs", "_css")
    # both joins broadcast the SMALL (pair-table) side and stream the
    # prefix rows past it — at no point do the N prefix rows shuffle
    first = pre.select(
        F.col("_sym").alias("symbol_a"),
        F.col("_idx").cast("long").alias("n_obs"),  # match count()'s type
        F.col("_cs").cast("double").alias("_sx"),
        F.col("_css").cast("double").alias("_sxx"),
    ).join(F.broadcast(g), ["symbol_a", "n_obs"])
    j = pre.select(
        F.col("_sym").alias("symbol_b"),
        F.col("_idx").cast("long").alias("n_obs"),
        F.col("_cs").cast("double").alias("_sy"),
        F.col("_css").cast("double").alias("_syy"),
    ).join(F.broadcast(first), ["symbol_b", "n_obs"])
    n = F.col("n_obs")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return j.select("symbol_a", "symbol_b", "n_obs", corr.alias("corr"))


def pairwise_return_correlation(
    df: DataFrame,
    price_col: str = "close",
    symbol_col: str = "symbol",
    order_cols: tuple[str, ...] = ("datetime", "bar_id"),
    min_obs: int = 2,
    lag: int = 0,
) -> DataFrame:
    """(symbol_a, symbol_b, n_obs, corr) for every unordered symbol
    pair with at least ``min_obs`` aligned return observations.

    ``lag=k`` computes the LEAD-LAG cross-correlation: a's return at
    index i pairs with b's at index i+k (does a lead b by k bars?).
    With a nonzero lag the pair is ordered, so both (a, b) and (b, a)
    rows are emitted — corr(a_t, b_{t+k}) and corr(b_t, a_{t+k}) are
    different questions; at lag 0 they coincide and only the
    symbol_a < symbol_b half is kept.

    Negative lags normalize internally: corr(a_t, b_{t+k}) for k < 0
    is exactly corr(b_t, a_{t-k}) with the symbol roles swapped (set
    j = i + k: the pair set {(ra_i, rb_{i+k})} == {(rb_j, ra_{j-k})}
    and the correlation formula is symmetric under the (x, y) swap),
    so the positive-lag prefix decomposition runs and the output
    columns swap back. The r8 decomposition alone mishandled k < 0 —
    its b-side lower-boundary lookup ``_idx == lag`` matches no rows
    for negative lag, silently emitting zero pairs."""
    dec = "decimal(38,18)"

    if lag < 0:
        res = pairwise_return_correlation(
            df, price_col, symbol_col, order_cols, min_obs, -lag
        )
        return res.select(
            F.col("symbol_b").alias("symbol_a"),
            F.col("symbol_a").alias("symbol_b"),
            "n_obs",
            "corr",
        )

    from marketdatapipeline_spark.caching import scoped_persist

    # ONE pass computes returns, indexes, AND the decimal prefix sums
    # (fused into the same window stage), persisted so the pair chain
    # and the boundary lookup both read it — previously each path
    # recomputed the whole bars-scan + window chain (r10: ~0.4 s of
    # duplicated work per query at sf0.1).
    rets = scoped_persist(
        bar_index_returns(
            df, price_col, symbol_col, order_cols, decimal_prefix=dec
        )
    )

    if lag == 0:
        return _corr_lag0_prefix(rets, min_obs, dec)

    # ONE pivot groupBy, self-joined at the shifted key (r10): the
    # persisted index pivot serves as BOTH sides — the a-side at key
    # i and, re-keyed to i-lag, the b-side — so the pivot's 100k-
    # struct shuffle happens once and the join streams the cached
    # ~N/S-row table against itself. Replaces the r9 union-explode
    # (which carried every return TWICE through the groupBy with
    # when()-nulled role tagging): construction+materialize 2.3 s ->
    # 1.2 s at sf0.1. The join stays a shuffle join, not a broadcast
    # — the pivot table is N/S rows and does not fit a driver at
    # 100 TB.
    ea = scoped_persist(
        rets.groupBy("_idx").agg(
            F.collect_list(F.struct("_sym", "_ret")).alias("_ea")
        )
    )
    eb = ea.select(
        (F.col("_idx") - F.lit(lag)).alias("_idx"),
        F.col("_ea").alias("_eb"),
    )
    joined = (
        ea.join(eb, "_idx")
        # same single-task-explode guard as the lag-0 path: the pivot
        # table is byte-small (AQE coalesces it) but fans out to S^2
        # pair rows per index — force the explode to spread.
        .repartition(
            rets.sparkSession.sparkContext.defaultParallelism, "_idx"
        )
    )
    pairs = (
        joined
        .select(F.explode("_ea").alias("_a"), "_eb")
        .select(
            F.col("_a._sym").alias("symbol_a"),
            F.col("_a._ret").alias("_ra"),
            F.explode("_eb").alias("_b"),
        )
        .select(
            "symbol_a",
            F.col("_b._sym").alias("symbol_b"),
            "_ra",
            F.col("_b._ret").alias("_rb"),
        )
        .filter(F.col("symbol_a") != F.col("symbol_b"))
    )

    # r8 prefix decomposition, lag generalization: only the CROSS term
    # needs pair rows. For a pair (a, b) at lag k with m aligned
    # observations, a's sums are its prefix sums at m, and b's are
    # prefix DIFFERENCES over [k+1, m+k] — decimal subtraction is
    # exact, so every sum is bit-identical to the direct per-pair
    # aggregation the oracle keeps. 5x less per-pair-row decimal
    # arithmetic (measured 5.7 s -> the lag-0 fix's band at sf0.1).
    # The tiny pair table is PERSISTED (it anchors both the output and
    # the boundary-key generator below; unpersisted, the fork would
    # re-run the whole pair aggregation — the expensive stage).
    g = scoped_persist(
        pairs.groupBy("symbol_a", "symbol_b")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum((F.col("_ra") * F.col("_rb")).cast(dec))
            .cast("double")
            .alias("_sxy"),
        )
        .filter(F.col("n_obs") >= min_obs)
    )

    # running sums narrow to decimal(28,18) before the b-side boundary
    # SUBTRACTION below (r9): (38,18)-(38,18) needs precision 39, which
    # allowPrecisionLoss resolves by dropping a scale digit — 1 ulp of
    # drift vs the oracle's direct pair sums, enough to flip a round-6
    # tie. (28,18)-(28,18) types as (29,18): full scale, exact. (The
    # narrowing cast is itself exact while prefix magnitudes < 1e10.)
    narrow = "decimal(28,18)"
    pre = rets.select(
        "_sym",
        "_idx",
        F.col("_cs").cast(narrow).alias("_cs"),
        F.col("_css").cast(narrow).alias("_css"),
    )
    # Boundary lookups in ONE pass over the prefix rows (r9): each
    # pair needs three prefix-sum boundary rows — a's prefix at m,
    # b's at m+k (upper) and at k (lower). r8 streamed `pre` through
    # three separate joins, which Spark planned as three full
    # scan+sort+window evaluations (no subplan sharing across a
    # DataFrame fork). Now the pair table generates all boundary KEYS
    # (3 rows per pair, broadcast), a single `pre` pass inner-joins
    # them (~3·S² surviving rows), and a tiny pivot glues the three
    # roles back onto each pair. Decimals stay decimal through the
    # pivot; the b-range subtraction still happens before any double
    # cast.
    keys = g.select(
        "symbol_a",
        "symbol_b",
        F.explode(
            F.array(
                F.struct(
                    F.col("symbol_a").alias("_ksym"),
                    F.col("n_obs").alias("_kidx"),
                    F.lit("a").alias("_role"),
                ),
                F.struct(
                    F.col("symbol_b").alias("_ksym"),
                    (F.col("n_obs") + F.lit(lag)).alias("_kidx"),
                    F.lit("bu").alias("_role"),
                ),
                F.struct(
                    F.col("symbol_b").alias("_ksym"),
                    F.lit(lag).cast("long").alias("_kidx"),
                    F.lit("bl").alias("_role"),
                ),
            )
        ).alias("_k"),
    ).select("symbol_a", "symbol_b", "_k._ksym", "_k._kidx", "_k._role")
    bounds = pre.join(
        F.broadcast(keys),
        (F.col("_sym") == F.col("_ksym"))
        & (F.col("_idx").cast("long") == F.col("_kidx")),
    )

    def role(r: str, c: str):
        return F.max(F.when(F.col("_role") == r, F.col(c)))

    piv = bounds.groupBy("symbol_a", "symbol_b").agg(
        role("a", "_cs").cast("double").alias("_sx"),
        role("a", "_css").cast("double").alias("_sxx"),
        role("bu", "_cs").alias("_cs_u"),
        role("bu", "_css").alias("_css_u"),
        role("bl", "_cs").alias("_cs_l"),
        role("bl", "_css").alias("_css_l"),
    )
    j = g.join(F.broadcast(piv), ["symbol_a", "symbol_b"])
    sy = (F.col("_cs_u") - F.col("_cs_l")).cast("double")
    syy = (F.col("_css_u") - F.col("_css_l")).cast("double")
    n = F.col("n_obs")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * syy - sy * sy
    cov = n * F.col("_sxy") - F.col("_sx") * sy
    corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return j.select("symbol_a", "symbol_b", "n_obs", corr.alias("corr"))
