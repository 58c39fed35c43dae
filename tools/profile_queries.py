"""Per-query job/stage/task profiler.

Runs named catalog queries standalone against a sf dir and prints
wall seconds plus the number of Spark jobs, stages, and tasks each
query launched — the fixed-overhead decomposition that explains
in-suite medians at small SF (at sf0.1 most frames are tiny, so the
median IS the stage/job overhead, not data volume).

Usage: python tools/profile_queries.py q1 q2 ... [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from __spark_entry__ import queries as gate_queries, extended_queries
    from marketdatapipeline_spark.session import get_spark
    from marketdatapipeline_spark.caching import release_caches

    qs = {**gate_queries(), **extended_queries()}
    spark = get_spark()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in args.queries:
        fn = qs[name]
        times = []
        jobs = stages = tasks = 0
        for rep in range(args.reps):
            release_caches()
            # count via a fresh job group so ids are attributable
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            dt = time.perf_counter() - t0
            sc.setJobGroup("", "")
            times.append(dt)
            if rep == args.reps - 1:
                jids = [j for j in (tracker.getJobIdsForGroup(group) or [])]
                jobs = len(jids)
                sids = set()
                ntask = 0
                for j in jids:
                    info = tracker.getJobInfo(j)
                    if info is None:
                        continue
                    for s in info.stageIds:
                        if s in sids:
                            continue
                        sids.add(s)
                        si = tracker.getStageInfo(s)
                        if si is not None:
                            ntask += si.numTasks
                stages = len(sids)
                tasks = ntask
        med = sorted(times)[len(times) // 2]
        print(
            f"{name:40s} med={med:6.3f}s  runs={['%.3f' % t for t in times]}"
            f"  jobs={jobs} stages={stages} tasks={tasks}",
            flush=True,
        )


if __name__ == "__main__":
    main()
