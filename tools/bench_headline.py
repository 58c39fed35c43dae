"""Standalone headline measurement: 1M-row feature pipeline, clean session.

Runs ONLY the headline (no catalog loop, no pytest contamination) with
median-of-N steady-state methodology identical to bench.py, so round-over-
round headline numbers can be compared without session-state confounds.

Usage: python tools/bench_headline.py [repeats] [warmups]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import replicated_bars, run_feature_pipeline  # noqa: E402


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    warmups = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from marketdatapipeline_spark.session import get_spark
    from marketdatapipeline_spark.sources import bars_from_events

    spark = get_spark(app_name="bench_headline")
    warm_tier = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_tier):  # host without the smoke tier
        warm_tier = sf_dir
    run_feature_pipeline(spark, bars_from_events(spark, warm_tier))

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    copies = max(1, round(1_000_000 / n_events))
    bars = replicated_bars(spark, sf_dir, copies, multi_symbol=True)

    # the ONE timing loop — bench.py's, gc hygiene included
    med, runs = run_feature_pipeline(
        spark, bars, repeats=repeats, warmups=warmups, return_times=True
    )
    print(
        json.dumps(
            {"headline_sec": round(med, 3), "runs": [round(t, 3) for t in runs]}
        )
    )


if __name__ == "__main__":
    main()
