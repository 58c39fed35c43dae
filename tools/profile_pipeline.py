"""Stage-by-stage timing of the feature pipeline at ~1M rows."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:45s} {time.perf_counter() - t0:7.2f}s", flush=True)


def main():
    from bench import replicated_bars
    from marketdatapipeline_spark.features import compute_all_features, generate_targets
    from marketdatapipeline_spark.features.engineering import (
        compute_momentum_features,
        compute_temporal_features,
        compute_volatility_features,
    )
    from marketdatapipeline_spark.features.ewm import add_technical_ewm_features
    from marketdatapipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile")

    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    copies = max(1, round(1_000_000 / n))
    print(f"events={n} copies={copies}")

    bars = replicated_bars(spark, sf_dir, copies, multi_symbol=True)
    bars_cached = bars.persist()
    print("rows:", bars_cached.count())

    t("scan+replicate only", bars)
    t("cached scan", bars_cached)
    t("ewm only (applyInPandas)", add_technical_ewm_features(bars_cached, order_cols=("datetime", "bar_id")))
    t("momentum only", compute_momentum_features(bars_cached, order_cols=("datetime", "bar_id")))
    t("volatility only", compute_volatility_features(bars_cached, order_cols=("datetime", "bar_id")))
    t("temporal only", compute_temporal_features(bars_cached))
    feats = compute_all_features(bars_cached, order_cols=("datetime", "bar_id"))
    t("all features", feats)
    t("all + targets", generate_targets(feats, order_cols=("datetime", "bar_id")))


if __name__ == "__main__":
    main()
