"""Rolling-window helpers with Polars ``min_periods`` semantics.

The reference's rolling aggregates (Polars ``rolling_mean/std/sum``,
e.g. reference src/features/engineering.py:59-60, 109, 144, 148) emit
NULL until the window holds ``window_size`` non-null values
(``min_periods`` defaults to the window size). Spark's
``agg().over(rowsBetween(-(n-1), 0))`` emits partial aggregates from
the first row instead, so every rolling helper here masks rows whose
frame holds fewer than ``n`` non-null values (SURVEY.md trap T1).

All helpers take a base ``WindowSpec`` already partitioned by symbol
and ordered by event time; they derive the row-frame themselves.
At scale this partitioning means ONE hash exchange on ``symbol``
shared by every window column in the stage — Catalyst collapses
identical WindowSpecs into a single physical Window node.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def rows_frame(w: WindowSpec, n: int) -> WindowSpec:
    """Trailing frame of ``n`` rows ending at the current row."""
    return w.rowsBetween(-(n - 1), 0)


def _masked(col: Column, n: int, frame: WindowSpec, agg: Column) -> Column:
    """NULL unless the frame holds >= n non-null values (trap T1).

    ``F.count`` counts non-nulls, which matches Polars' definition of
    ``min_periods`` (number of valid values before emitting).
    """
    return F.when(F.count(col).over(frame) >= n, agg)


def rolling_mean(col: Column, n: int, w: WindowSpec) -> Column:
    f = rows_frame(w, n)
    return _masked(col, n, f, F.avg(col).over(f))


def rolling_std(col: Column, n: int, w: WindowSpec) -> Column:
    """Sample standard deviation (ddof=1), matching Polars' default."""
    f = rows_frame(w, n)
    return _masked(col, n, f, F.stddev_samp(col).over(f))


def rolling_sum(col: Column, n: int, w: WindowSpec) -> Column:
    f = rows_frame(w, n)
    return _masked(col, n, f, F.sum(col).over(f))


class RollingPlan:
    """O(n) rolling aggregates via prefix-sum differences.

    Spark's SlidingWindowFunctionFrame re-evaluates the aggregate over
    the whole frame for every output row — O(rows x window) per rolling
    column, ~100x slower than Polars' incremental rolling kernels at
    window 60. Unbounded-preceding frames, by contrast, are evaluated
    incrementally (UnboundedPrecedingWindowFunctionFrame), and lag is a
    plain offset lookup. So each rolling aggregate becomes:

        roll_sum(x, n)_t  = S_t - S_{t-n}          S = running sum
        roll_cnt(x, n)_t  = C_t - C_{t-n}          C = running count
        roll_mean(x, n)_t = roll_sum / roll_cnt
        roll_var(x, n)_t  = max(Q_t - Q_{t-n} - roll_sum^2/roll_cnt, 0)
                            / (roll_cnt - 1)       Q = running sum(x^2)

    Two chained Window nodes (running sums, then their lags) with the
    same partitioning and ordering: one exchange, one sort, O(n) work.
    The max(.., 0) clamps the tiny negative residue FP cancellation can
    leave on constant stretches. Cancellation error is bounded by the
    prefix-sum magnitude x ulp — per-symbol histories up to ~1e7 rows
    of O(1e3) values stay far below the 1e-6 the oracle rounds to.
    Polars min_periods masking (trap T1) is preserved via the count
    difference.

    Usage: request aggregates, then apply() once::

        plan = RollingPlan(w)
        sma = plan.mean(F.col("close"), 20, "sma20")
        out = plan.apply(df, {"sma20": sma})
    """

    def __init__(self, w: WindowSpec, tag: str = "r") -> None:
        from pyspark.sql import Window

        self._w = w
        self._cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        self._tag = tag
        self._stage_sums: dict[str, Column] = {}
        self._stage_reprs: dict[str, str] = {}
        self._stage_lags: dict[str, tuple[str, int]] = {}

    def _register(self, name: str, built: Column, key: str) -> str:
        """Register a running column, or validate an existing
        registration is the SAME expression — silently reusing a key
        across different columns/types would return the first
        registration's running sum and produce wrong frame sums with
        no error (r9 review)."""
        rep = str(built)
        if name in self._stage_sums:
            if self._stage_reprs[name] != rep:
                raise ValueError(
                    f"RollingPlan key {key!r} already registered with a "
                    f"different expression: {self._stage_reprs[name]} "
                    f"vs {rep}; use a distinct key"
                )
        else:
            self._stage_sums[name] = built
            self._stage_reprs[name] = rep
        return name

    def _running(self, kind: str, col: Column, key: str) -> str:
        agg = {
            "s": F.sum(col),
            "c": F.count(col),
            "q": F.sum(col * col),
        }[kind]
        return self._register(
            f"_{self._tag}_{kind}_{key}", agg.over(self._cum), key
        )

    def _lagged(self, base: str, n: int) -> str:
        name = f"{base}_l{n}"
        if name not in self._stage_lags:
            self._stage_lags[name] = (base, n)
        return name

    def _diff(self, base: str, n: int) -> Column:
        return F.col(base) - F.coalesce(F.col(self._lagged(base, n)), F.lit(0.0))

    def _cnt(self, col: Column, n: int, key: str) -> Column:
        base = self._running("c", col, key)
        return F.col(base) - F.coalesce(
            F.col(self._lagged(base, n)), F.lit(0)
        )

    def _mask(self, cnt: Column, n: int, value: Column) -> Column:
        return F.when(cnt >= n, value)

    def sum(self, col: Column, n: int, key: str) -> Column:
        cnt = self._cnt(col, n, key)
        return self._mask(cnt, n, self._diff(self._running("s", col, key), n))

    # -- exact-type frame sums (r9) -------------------------------------
    # The catalog's engine-exact queries accumulate decimal(38,18) (or
    # integral) power sums inside sliding frames; decimal/integer
    # addition is associative-EXACT, so the prefix difference
    # S_t - S_{t-n} is bit-identical to the direct frame aggregation —
    # the DuckDB oracles keep their direct rolling sums and still
    # match cell-for-cell. These return the UNMASKED frame sum typed
    # as the running column (callers mask on count() themselves, since
    # the mask predicate differs per query), with the coalesce zero
    # cast to the SAME type so no double promotion sneaks in.

    def _running_expr(self, built: Column, key: str) -> str:
        """Register a fully-built running column (already ``.over``'d,
        possibly post-cast) under a stable name; raises on a
        conflicting re-registration of the same key."""
        return self._register(f"_{self._tag}_x_{key}", built, key)

    def dec_sum(
        self, col: Column, n: int, key: str, dec: str = "decimal(38,18)"
    ) -> Column:
        """Trailing-frame ``sum(col.cast(dec))`` via prefix diffs.

        The running sum (which Spark types ``decimal(38, s)``) is
        narrowed to precision 28 BEFORE the subtraction: a
        ``(38,s) - (38,s)`` difference needs precision 39, which
        Spark's allowPrecisionLoss resolves by dropping a scale digit
        — the resulting 1-ulp-at-1e-{s} drift vs the direct frame sum
        is exactly the kind of noise that flips a round-6 tie (the r5
        lesson). ``(28,s) - (28,s)`` types as ``(29,s)`` — full scale
        kept, bit-identical to the direct aggregation (pinned in
        test_windows). The narrowing cast is exact while the PREFIX
        sum magnitude stays under 1e{28-s} — for O(1e-2) return terms
        at scale 18 that is ~1e12 rows per symbol."""
        scale = dec.rstrip(")").rsplit(",", 1)[1]
        narrow = f"decimal(28,{scale})"
        base = self._running_expr(
            F.sum(col.cast(dec)).over(self._cum).cast(narrow), key
        )
        return F.col(base) - F.coalesce(
            F.col(self._lagged(base, n)), F.lit(0).cast(narrow)
        )

    def long_sum(self, col: Column, n: int, key: str) -> Column:
        """Trailing-frame sum of an integral column via prefix diffs."""
        base = self._running_expr(F.sum(col).over(self._cum), key)
        return F.col(base) - F.coalesce(
            F.col(self._lagged(base, n)), F.lit(0).cast("long")
        )

    def count(self, col: Column, n: int, key: str) -> Column:
        """Trailing-frame non-null count (the min_periods input)."""
        return self._cnt(col, n, key)

    def mean(self, col: Column, n: int, key: str) -> Column:
        cnt = self._cnt(col, n, key)
        s = self._diff(self._running("s", col, key), n)
        return self._mask(cnt, n, s / cnt)

    def sum_of_squares(self, col: Column, n: int, key: str) -> Column:
        """Rolling sum(col^2) — shares the running Q column with std()."""
        cnt = self._cnt(col, n, key)
        return self._mask(cnt, n, self._diff(self._running("q", col, key), n))

    def std(self, col: Column, n: int, key: str) -> Column:
        cnt = self._cnt(col, n, key)
        s = self._diff(self._running("s", col, key), n)
        q = self._diff(self._running("q", col, key), n)
        m2 = F.greatest(q - (s * s) / cnt, F.lit(0.0))
        return self._mask(cnt, n, F.sqrt(m2 / (cnt - F.lit(1))))

    @property
    def temp_columns(self) -> list[str]:
        return [*self._stage_sums, *self._stage_lags]

    def materialize(self, df):
        """Add the running sums (one Window node) then their lags
        (a second chained node, same spec — no extra exchange/sort)."""
        out = df.withColumns(self._stage_sums)
        if self._stage_lags:
            out = out.withColumns(
                {
                    name: F.lag(F.col(base), n).over(self._w)
                    for name, (base, n) in self._stage_lags.items()
                }
            )
        return out

    def apply(self, df, outputs: dict[str, Column]):
        """Materialize temps, add the outputs, drop the temps."""
        return self.materialize(df).withColumns(outputs).drop(*self.temp_columns)
