"""Population stability index — train/serve drift monitoring.

The standard production-ML check: bin each feature by the TRAIN
distribution's quantiles, compare the bin shares a later sample
(test window, serving traffic) lands in, and sum
``(q_i - p_i) * ln(q_i / p_i)``. PSI < 0.1 is stable, 0.1-0.25
drifting, > 0.25 action. The reference has no monitoring stage; this
extends the ML surface the same way scaling/validation do.

Plan shape per feature: ONE quantile aggregation on train (a single
tiny edges row), then ONE shared aggregation over train+test with the
bin assignment computed scan-side against the broadcast edges array
(``size(filter(edges, e -> x >= e))`` — no join key, no shuffle of
the data beyond the count aggregation). Features iterate in a Python
loop over a SMALL column list, unioning bins x features result rows
— never rows of data.

Determinism: bin edges are round-6 train quantiles (the published
binning contract — also what makes Spark's exact ``percentile`` and
DuckDB's ``quantile_cont`` agree bit-for-bit); counts are integers;
the PSI terms cross ``ln`` (libm) and emit round-6.

``method="approx"`` swaps the exact percentile for
``approx_percentile`` — the 100 TB path (sketch-mergeable, no sort)
with the same downstream contract, at the cost of edge exactness
(not value-oracled for that reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["calibration_curve", "psi_drift"]

_DEC = "decimal(38,18)"


def psi_drift(
    train: DataFrame,
    test: DataFrame,
    cols: list[str],
    n_bins: int = 10,
    eps: float = 1e-6,
    method: str = "exact",
) -> DataFrame:
    """(feature, bin, train_n, test_n, train_pct, test_pct, psi_term,
    psi_total): per-bin PSI decomposition plus the per-feature total
    (repeated across the feature's rows — one output table, no
    second query).

    Bins are left-closed on round-6 train quantile edges
    (``bin = #edges <= x``, so bin 0 is below the first decile edge);
    empty shares substitute ``eps`` inside the log (the standard
    finite-PSI convention). Null feature values are dropped."""
    if method not in ("exact", "approx"):
        raise ValueError(f"unknown method: {method!r}")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from marketdatapipeline_spark.caching import scoped_persist

    fracs = F.array(
        *[F.lit(i / n_bins) for i in range(1, n_bins)]
    )
    # r10: ONE pass per input, all features together. The per-column
    # loop referenced `train` twice (edges agg + union) and `test`
    # once PER FEATURE — with upstream chains (splits, feature
    # engineering) recomputed at every reference, 2 features meant
    # six executions of the source plan. Now: narrow projections are
    # persisted once, every feature's quantile edges come from one
    # agg over the cache, and one union pass emits (feature, bin)
    # structs scan-side (null values dropped per feature, exactly as
    # the per-column filter did).
    tr = scoped_persist(
        train.select(*[F.col(c).cast("double").alias(c) for c in cols])
    )
    te = scoped_persist(
        test.select(*[F.col(c).cast("double").alias(c) for c in cols])
    )

    def q_of(c: str):
        x = F.col(c)
        return (
            F.percentile(x, fracs)
            if method == "exact"
            else F.approx_percentile(x, fracs, F.lit(10_000))
        )

    edges_row = F.broadcast(
        tr.agg(
            *[
                F.transform(q_of(c), lambda e: F.round(e, 6) + F.lit(0.0))
                .alias(f"_edges_{i}")
                for i, c in enumerate(cols)
            ]
        )
    )
    both = tr.withColumn("_w", F.lit("train")).unionByName(
        te.withColumn("_w", F.lit("test"))
    )
    per_feature = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                F.when(
                    F.col(c).isNotNull(),
                    F.size(
                        F.filter(
                            F.col(f"_edges_{i}"), lambda e: F.col(c) >= e
                        )
                    ),
                ).alias("bin"),
            )
            for i, c in enumerate(cols)
        ]
    )
    binned = (
        both.crossJoin(edges_row)
        .select("_w", F.explode(per_feature).alias("_s"))
        .select("_w", F.col("_s.feature").alias("feature"), F.col("_s.bin").alias("bin"))
        .filter(F.col("bin").isNotNull())
    )
    out = binned.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col("_w") == "train", 1).otherwise(0)).alias(
            "train_n"
        ),
        F.sum(F.when(F.col("_w") == "test", 1).otherwise(0)).alias(
            "test_n"
        ),
    )
    from pyspark.sql import Window

    wf = Window.partitionBy("feature")
    tn = F.sum("train_n").over(wf).cast("double")
    sn = F.sum("test_n").over(wf).cast("double")
    p = F.col("train_n").cast("double") / tn
    q = F.col("test_n").cast("double") / sn
    pe = F.when(p > 0, p).otherwise(F.lit(float(eps)))
    qe = F.when(q > 0, q).otherwise(F.lit(float(eps)))
    term = (qe - pe) * F.log(qe / pe)
    scored = out.withColumns(
        {
            "train_pct": p,
            "test_pct": q,
            "psi_term": term,
        }
    )
    total = F.sum(F.col("psi_term").cast(_DEC)).over(wf).cast("double")
    return scored.withColumn("psi_total", total)


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    method: str = "exact",
) -> DataFrame:
    """(bin, n_obs, mean_score, pos_rate, gap): the reliability
    diagram behind every classifier audit — scores bucketed by their
    own quantiles (round-6 edges, the PSI binning contract: no
    global sort, engine-exact membership), observed positive rate
    vs mean predicted score per bucket. A calibrated model sits on
    the diagonal; ``gap = pos_rate - mean_score`` is the per-bucket
    miscalibration. ``method="approx"`` is the sketch-mergeable
    100 TB path."""
    if method not in ("exact", "approx"):
        raise ValueError(f"unknown method: {method!r}")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    x = F.col(score_col).cast("double")
    fracs = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    q = (
        F.percentile(x, fracs)
        if method == "exact"
        else F.approx_percentile(x, fracs, F.lit(10_000))
    )
    edges = F.broadcast(
        df.agg(
            F.transform(q, lambda e: F.round(e, 6) + F.lit(0.0)).alias("_e")
        )
    )
    base = df.filter(x.isNotNull() & F.col(label_col).isNotNull())
    binned = base.crossJoin(edges).select(
        F.size(F.filter(F.col("_e"), lambda e: x >= e)).alias("bin"),
        x.alias("_s"),
        F.col(label_col).cast("double").alias("_y"),
    )
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("_s").cast(_DEC)).cast("double").alias("_ss"),
        F.sum(F.col("_y").cast(_DEC)).cast("double").alias("_sy"),
    )
    n = F.col("n_obs").cast("double")
    mean_score = F.col("_ss") / n
    pos_rate = F.col("_sy") / n
    return g.select(
        "bin",
        "n_obs",
        mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
        (pos_rate - mean_score).alias("gap"),
    )
