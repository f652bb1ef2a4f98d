#!/usr/bin/env python3
"""Benchmark: run the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized through the ``noop`` sink (all columns
computed and serialized — ``count()`` would let Catalyst prune expensive
projections and flatter the numbers); a warmup pass on the smallest SF
primes the JVM/codegen so the timing reflects steady-state execution, not
JVM startup.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hainan_big_data_recommend_system_spark.qcatalog import REGISTRY  # noqa: E402
from hainan_big_data_recommend_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOAD_AT_LAUNCH = os.getloadavg()


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


def main() -> None:
    spark = get_spark(app_name="bench")
    # start from a cold stage dir so the one-time cost of the staged dedup
    # intermediates is measured INSIDE this run (once), not amortized away
    # by a previous run's leftovers
    import shutil

    shutil.rmtree(
        os.environ.get("SPARK_GRAFT_STAGE_DIR", "/tmp/spark_graft_stage"),
        ignore_errors=True,
    )
    # warmup: flagship on the smallest sf primes codegen + parquet reader
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        try:
            REGISTRY["hot_items"].fn(spark, warm_dir).collect()
        except Exception:
            pass
    # warm MLlib: ALS/KMeans first use loads netlib-BLAS + a few hundred
    # JVM classes; round 1 charged that (~20s observed) to whichever ML
    # query happened to run first.  A 64-cell ALS fit + a 2-point KMeans
    # fit pay it here, so per-query timings measure the algorithms.
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.linalg import Vectors
        from pyspark.ml.recommendation import ALS

        tiny = spark.createDataFrame(
            [(u, i, 1.0) for u in range(8) for i in range(8)],
            "user int, item int, rating float",
        )
        als_m = ALS(
            rank=2, maxIter=1, seed=0, userCol="user", itemCol="item",
            ratingCol="rating", implicitPrefs=True,  # same solver path as
            numUserBlocks=2, numItemBlocks=2,        # the catalog query
        ).fit(tiny)
        als_m.recommendForAllUsers(2).write.format("noop").mode(
            "overwrite"
        ).save()
        pts = spark.createDataFrame(
            [(Vectors.dense([0.0]),), (Vectors.dense([1.0]),)], ["features"]
        )
        KMeans(k=2, seed=0, maxIter=1).fit(pts)
    except Exception:
        pass
    # warm the Arrow Python runner: the FIRST applyInPandas / mapInPandas
    # of a session forks the Python worker pool and imports pandas/pyarrow
    # in the workers (~2.2s measured on this host) — round 15 charged it
    # to whichever staging line or query crossed the Python boundary
    # first.  Two 64-row jobs (one per eval type) pay it here, the same
    # rationale as the MLlib/codegen warmups above: per-query timings
    # measure the operators, not interpreter start-up.
    try:
        tiny_py = spark.createDataFrame(
            [(i % 4, i) for i in range(64)], "k int, v long"
        )
        tiny_py.groupBy("k").applyInPandas(
            lambda pdf: pdf, "k int, v long"
        ).write.format("noop").mode("overwrite").save()
        tiny_py.mapInPandas(
            lambda it: it, "k int, v long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    spark.catalog.clearCache()
    # Prime the OS page cache for the benchmark tables: a full sequential
    # read of each parquet file before any timing starts.  Per-query numbers
    # then measure steady-state execution (plan + shuffle + compute), not
    # first-touch disk I/O — observed cold-cache inflation was ~1.6x on the
    # total, concentrated arbitrarily in whichever queries ran first.
    for f in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    timings: dict[str, float] = {}
    # Build the shared staged dedup tables (shingles + LSH buckets) as an
    # EXPLICIT, separately-reported step.  bench clears the stage dir
    # above, so without this line the one-time staging cost lands on
    # whichever dedup-chain query happens to run first — round 7 turned a
    # 2.5s query into an 8.2s optics problem that took key-order forensics
    # to adjudicate (PLANS §15 dedup_components).  The underscore key
    # marks it as a staging line, not a catalog query; it still counts in
    # the total (the work is real and happens once per cold run).
    try:
        from hainan_big_data_recommend_system_spark.qcatalog.dedup import (
            staged_buckets,
            staged_shingles,
        )

        t0 = time.perf_counter()
        staged_shingles(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        staged_buckets(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["_dedup_staging"] = round(time.perf_counter() - t0, 4)
        print(
            f"# _dedup_staging: {timings['_dedup_staging']:.3f}s",
            file=sys.stderr,
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    except Exception as e:  # staging is an optimization, never a gate
        print(f"# _dedup_staging skipped: {e}", file=sys.stderr)

    # Same honesty for the lake lifecycle fixture the three promoted
    # Iceberg rows share (rotation #11): build it ONCE as its own
    # reported line, so a cold fixture dir doesn't land its full
    # write+DML+compaction cost on whichever of the three runs first
    # (the same optics problem _dedup_staging solved for the dedup
    # chain).  A warm fixture dir makes this a no-op stat call.
    try:
        from hainan_big_data_recommend_system_spark.qcatalog.filescan import (
            _ensure_iceberg_lifecycle_fixture,
        )

        t0 = time.perf_counter()
        _ensure_iceberg_lifecycle_fixture(spark, SF_DIR)
        dt = round(time.perf_counter() - t0, 4)
        if dt >= 0.05:  # only report a real (cold) build
            timings["_iceberg_lifecycle_staging"] = dt
            print(f"# _iceberg_lifecycle_staging: {dt:.3f}s",
                  file=sys.stderr)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    except Exception as e:
        print(f"# _iceberg_lifecycle_staging skipped: {e}",
              file=sys.stderr)

    # Self-adjudicating artifact (VERDICT r13 #7 — three consecutive
    # rounds of manual contention forensics): each catalog row runs
    # TWICE.  The first (cold) timing keeps its historical meaning and
    # stays what "queries"/"value" report, so totals compare across
    # rounds; the second (warm) run isolates per-query codegen/JIT/
    # fixture cold-start, and the 1-minute loadavg sampled at each
    # query's start exposes host contention — an elevated cold total
    # with matching warm numbers and high loadavg adjudicates itself
    # from the JSON line alone.
    warm: dict[str, float] = {}
    loads: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        loads[name] = round(os.getloadavg()[0], 2)
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        # drop persisted intermediates so one query's cache (e.g. ALS
        # training data, shingle tables) can't squeeze the next query's
        # executor memory — each timing is an honest cold run.  The forced
        # GC collects the freed blocks NOW: without it, ML-training garbage
        # surfaces as a major GC inside a later query's timing (observed as
        # 3-4x spikes on the queries that happen to follow ALS).
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        warm[name] = round(time.perf_counter() - t0, 4)
        print(
            f"# {name}: {timings[name]:.3f}s cold / "
            f"{warm[name]:.3f}s warm (load {loads[name]})",
            file=sys.stderr,
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 4)
    # The driver keeps only a ~2 KB tail of stdout and parses the LAST
    # line as JSON (VERDICT r14 "what's wrong" #1: the enriched single
    # line grew past the tail window and the round-14 artifact lost its
    # cold total).  So: the adjudication extras (warm timings, loadavg)
    # go on an EARLIER stdout line and into a side file BENCH_LOCAL.json,
    # and the FINAL line stays the compact driver-parsed shape that fit
    # through round 13 — metric/value/unit/queries/sf only.
    extras = {
        "metric": "catalog_adjudication",
        "warm": warm,
        "warm_total": round(sum(warm.values()), 4),
        "loadavg_launch": [round(x, 2) for x in LOAD_AT_LAUNCH],
        "loadavg_per_query": loads,
    }
    print(json.dumps(extras))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"), "w"
        ) as fh:
            json.dump({**extras, "cold": timings, "cold_total": total}, fh)
    except OSError:
        pass  # read-only checkout: the stdout line above still carries it
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
