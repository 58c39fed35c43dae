"""Fresh-process A/B of feature_pipeline_1m_1sym between two repo
checkouts (VERDICT r13 item 3): run from either tree with the tree's
root as cwd; prints one median line. Methodology identical to
bench.py's _1sym unit (copies to 1M rows, multi_symbol=False,
repeats=3, warmups=2, fresh JVM)."""

import os
import sys

sys.path.insert(0, os.getcwd())

from bench import replicated_bars, run_feature_pipeline  # noqa: E402
from marketdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="ab_1sym")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = spark.read.parquet(f"{sf}/events.parquet").count()
    copies = max(1, round(1_000_000 / n))
    med, raw = run_feature_pipeline(
        spark,
        replicated_bars(spark, sf, copies, multi_symbol=False),
        repeats=3,
        warmups=2,
        return_times=True,
    )
    load1 = os.getloadavg()[0]
    print(
        f"AB1SYM cwd={os.getcwd()} median={med:.3f} "
        f"raw={[round(t, 3) for t in raw]} load1_end={load1:.2f}"
    )


if __name__ == "__main__":
    main()
