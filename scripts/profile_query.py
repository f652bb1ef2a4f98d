#!/usr/bin/env python3
"""Per-query profiler: split a registry query's cost into DataFrame
CONSTRUCTION (driver/py4j + any eager probe/checkpoint jobs) vs
EXECUTION (the noop-sink materialization), with statusTracker job
counts for each phase.  Dev tooling — not part of the engine or bench.

Usage: python scripts/profile_query.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_PROFILE_REPS (default 2; rep 0 is cold, last is warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hainan_big_data_recommend_system_spark.session import get_spark  # noqa: E402
from hainan_big_data_recommend_system_spark.qcatalog import REGISTRY  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
    spark = get_spark(app_name="profile_query")
    sc = spark.sparkContext
    for name in names:
        spec = REGISTRY[name]
        for rep in range(reps):
            label = f"{name}#r{rep}"
            sc.setJobGroup(label + ":build", label)
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            jb = len(sc.statusTracker().getJobIdsForGroup(label + ":build"))
            sc.setJobGroup(label + ":exec", label)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            je = len(sc.statusTracker().getJobIdsForGroup(label + ":exec"))
            sc.setJobGroup(None, None)
            print(f"{name} rep{rep}: build {t1 - t0:6.2f}s ({jb} jobs) | "
                  f"exec {t2 - t1:6.2f}s ({je} jobs) | "
                  f"total {t2 - t0:6.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
