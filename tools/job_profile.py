"""Deterministic plan-shape profile: Spark JOB and STAGE counts per query.

Wall-clock on a noisy box cannot distinguish a removed scheduling round
from scheduler luck; the DAGScheduler's nextJobId / nextStageId atomics
can — they advance exactly once per submitted job / created stage, are
immune to external load, and let a claimed "one fewer eager checkpoint
round" be verified as job_count dropping by exactly one.

Usage: python tools/job_profile.py [sf_dir] query [query ...]
Prints one line per query: name, jobs, stages, wall (wall still noisy,
reported for context only).  Each query runs twice; counts are from the
SECOND run (steady state: pass 1 pays broadcast-warmup jobs that a warm
session never resubmits).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _counters(spark) -> tuple[int, int]:
    sc = spark.sparkContext._jsc.sc()  # noqa: SLF001
    # py4j converts the AtomicInteger accessors to plain ints already on
    # some bridge versions; normalize both shapes
    j = sc.dagScheduler().nextJobId()
    s = sc.dagScheduler().nextStageId()
    j = j if isinstance(j, int) else j.get()
    s = s if isinstance(s, int) else s.get()
    return int(j), int(s)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    if not args:
        raise SystemExit("usage: job_profile.py [sf_dir] query [query ...]")

    from polars_incremental_spark.cache import release_operator_caches
    from polars_incremental_spark.queries import REGISTRY
    from polars_incremental_spark.session import get_spark

    spark = get_spark("job_profile")
    # warm the session the way bench.py does
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .limit(10000)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    print(f"{'query':35s} {'jobs':>5s} {'stages':>7s} {'wall_s':>7s}")
    for name in args:
        fn, _sql = REGISTRY[name]
        for i in range(2):
            j0, s0 = _counters(spark)
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            j1, s1 = _counters(spark)
            release_operator_caches(spark)
        print(f"{name:35s} {j1 - j0:5d} {s1 - s0:7d} {wall:7.2f}")


if __name__ == "__main__":
    main()
