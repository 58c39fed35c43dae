"""Train-fitted feature scaling — the fit/transform contract done
right on a cluster.

The classic leakage bug is fitting the scaler on ALL rows; the
correct contract (sklearn ``StandardScaler.fit(train)`` then
``transform(everything)``) needs the statistics computed on the
train slice only and broadcast to every row. The reference pipeline
feeds raw features to tree models (no scaling stage), so this is
extension surface — but any linear/NN consumer of the exported
datasets needs it, and it belongs next to
:func:`ml.preparation.chronological_split`.

Plan shape: ``fit_standardizer`` is ONE map-side-combinable
aggregation producing a single tiny stats row (decimal power sums —
association-free, so the moments are bit-identical in any engine or
partial-agg order); ``apply_standardizer`` broadcast-joins that row
and z-scores scan-side. Nothing global-sorts, nothing collects
feature data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "apply_standardizer",
    "apply_winsorizer",
    "fit_standardizer",
    "fit_winsorizer",
    "scale_split",
    "standardize_split",
]

_DEC = "decimal(38,18)"


def fit_standardizer(
    train: DataFrame, cols: list[str], ddof: int = 0
) -> DataFrame:
    """ONE stats row: ``<c>_mean`` / ``<c>_std`` per feature column.

    Null feature values are excluded per-column (each column carries
    its own count — the pandas/sklearn convention). ``ddof=0``
    matches sklearn's StandardScaler; ``ddof=1`` gives the sample
    std. Std is null for degenerate columns (fewer than ``ddof + 1``
    observations, or zero variance rounded negative)."""
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"_n_{c}"),
            F.sum(x.cast(_DEC)).cast("double").alias(f"_s1_{c}"),
            F.sum((x * x).cast(_DEC)).cast("double").alias(f"_s2_{c}"),
        ]
    g = train.agg(*aggs)
    out = []
    for c in cols:
        n = F.col(f"_n_{c}").cast("double")
        s1, s2 = F.col(f"_s1_{c}"), F.col(f"_s2_{c}")
        var = (s2 - s1 * s1 / n) / (n - F.lit(float(ddof)))
        out += [
            (s1 / n).alias(f"{c}_mean"),
            F.when((n > ddof) & (var >= 0), F.sqrt(var)).alias(f"{c}_std"),
        ]
    return g.select(*out)


def apply_standardizer(
    df: DataFrame, stats: DataFrame, cols: list[str], suffix: str = "_z"
) -> DataFrame:
    """Add ``<c><suffix>`` z-scores using a fitted stats row
    (broadcast — one tiny row against the full table, scan-side
    arithmetic). Z is null where the value is null or the fitted std
    is null/zero (degenerate feature)."""
    joined = df.crossJoin(F.broadcast(stats))
    zcols = {}
    for c in cols:
        x = F.col(c).cast("double")
        std = F.col(f"{c}_std")
        zcols[f"{c}{suffix}"] = F.when(
            std > 0, (x - F.col(f"{c}_mean")) / std
        )
    out = joined.withColumns(zcols)
    drop = [f"{c}_mean" for c in cols] + [f"{c}_std" for c in cols]
    return out.drop(*drop)


def standardize_split(
    train: DataFrame,
    test: DataFrame,
    cols: list[str],
    ddof: int = 0,
    suffix: str = "_z",
) -> tuple[DataFrame, DataFrame]:
    """Fit on ``train`` ONLY, transform both halves — the
    leakage-free composition over
    :func:`ml.preparation.chronological_split` output."""
    stats = fit_standardizer(train, cols, ddof=ddof)
    return (
        apply_standardizer(train, stats, cols, suffix),
        apply_standardizer(test, stats, cols, suffix),
    )


def fit_winsorizer(
    train: DataFrame,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    method: str = "exact",
) -> DataFrame:
    """ONE stats row of round-6 train quantile clip edges
    (``<c>_lo`` / ``<c>_hi``) — rounding is part of the published
    contract (and what keeps exact engines bit-agreed on edges).
    ``method="approx"`` swaps in ``approx_percentile`` for the
    sketch-mergeable 100 TB path."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    if method not in ("exact", "approx"):
        raise ValueError(f"unknown method: {method!r}")
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        if method == "exact":
            q = F.percentile(x, F.array(F.lit(lower), F.lit(upper)))
        else:
            q = F.approx_percentile(
                x, F.array(F.lit(lower), F.lit(upper)), F.lit(10_000)
            )
        e = F.transform(q, lambda v: F.round(v, 6) + F.lit(0.0))
        aggs += [
            e[0].alias(f"{c}_lo"),
            e[1].alias(f"{c}_hi"),
        ]
    return train.agg(*aggs)


def apply_winsorizer(
    df: DataFrame, stats: DataFrame, cols: list[str], suffix: str = "_w"
) -> DataFrame:
    """Clip each ``c`` into its fitted [lo, hi] as ``<c><suffix>``,
    plus a ``<c><suffix>_clipped`` flag. Broadcast stats row,
    scan-side ``least/greatest`` — values are either the original
    doubles or the shared edges, so downstream comparisons stay
    engine-exact (no rounding at emission needed)."""
    joined = df.crossJoin(F.broadcast(stats))
    add = {}
    for c in cols:
        x = F.col(c).cast("double")
        lo, hi = F.col(f"{c}_lo"), F.col(f"{c}_hi")
        # greatest/least SKIP nulls (both engines), which would clip a
        # null input to the lower edge — gate explicitly instead
        add[f"{c}{suffix}"] = F.when(
            x.isNotNull(), F.least(F.greatest(x, lo), hi)
        )
        add[f"{c}{suffix}_clipped"] = x.isNotNull() & ((x < lo) | (x > hi))
    out = joined.withColumns(add)
    return out.drop(*[f"{c}_lo" for c in cols], *[f"{c}_hi" for c in cols])


def scale_split(
    train: DataFrame,
    test: DataFrame,
    cols: list[str],
    method: str = "standardize",
) -> tuple[DataFrame, DataFrame]:
    """Fit-on-train, transform-both, columns replaced IN PLACE — the
    pipeline-integration form (run_pipeline --scale): downstream
    consumers (model prep, predict) see the same column names, now
    scaled. ``method`` is ``"standardize"`` (z-scores) or
    ``"winsorize"`` (quantile clipping; the audit flags are dropped
    in replace mode)."""
    if method == "standardize":
        stats = fit_standardizer(train, cols)
        suffix, apply_fn, drop_extra = "_z", apply_standardizer, []
    elif method == "winsorize":
        stats = fit_winsorizer(train, cols)
        suffix, apply_fn = "_w", apply_winsorizer
        drop_extra = [f"{c}_w_clipped" for c in cols]
    else:
        raise ValueError(f"unknown scale method: {method!r}")

    def replace(df: DataFrame) -> DataFrame:
        out = apply_fn(df, stats, cols, suffix=suffix).drop(*drop_extra)
        for c in cols:
            out = out.drop(c).withColumnRenamed(f"{c}{suffix}", c)
        return out

    return replace(train), replace(test)
