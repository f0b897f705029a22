"""Measure the incremental-MV headline claim: refresh cost tracks the
CHANGE volume, not the base size (mv.py module docstring) — asserted
since round 6, measured here.

Method: a 5M-row base table (100k groups), an agg MV (count + sum), then
appends of exponentially growing size (1k → 1M rows).  After each append,
time (a) ``refresh_agg_mv`` — the CDF-driven incremental MERGE — against
(b) a FULL recompute of the same aggregate over the whole base written as
a fresh overwrite.  A delete-bearing window is measured too (the bounded
retracted-group re-aggregation path).

Expected shape (and the claim under test): refresh wall grows with the
append size while recompute wall grows with the BASE size, so the
advantage is largest exactly where production sits (small change rate on
a huge base).

The same protocol then runs against a JOIN MV (counted delta-join IVM):
a fact table of ``base_rows`` joined to a 10k-row dim, appends to the
fact side (ΔL⋈R₂ term), plus one dim-side delete window (L₁⋈ΔR term).

Usage: python tools/mv_bench.py [base_rows]   (default 5_000_000)
Prints one JSON line; findings go to PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_GROUPS = 100_000


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    from pyspark.sql import functions as F

    from polars_incremental_spark.mv import create_agg_mv, refresh_agg_mv
    from polars_incremental_spark.session import get_spark
    from polars_incremental_spark.sinks.deltalog import (
        delete_where,
        write_delta_fallback,
    )

    spark = get_spark("mv-bench")
    root = tempfile.mkdtemp(prefix="mv_bench_")
    base, mv = f"{root}/base", f"{root}/mv"

    def batch(n, start):
        return spark.range(start, start + n).select(
            (F.col("id") % N_GROUPS).cast("long").alias("g"),
            (F.col("id") * 7 % 1000).cast("long").alias("x"),
        )

    write_delta_fallback(batch(base_rows, 0), base)
    create_agg_mv(spark, base, mv, group_cols=["g"], sum_cols=["x"])

    results = {"base_rows": base_rows, "n_groups": N_GROUPS, "steps": []}
    nxt = base_rows
    for change in (1_000, 10_000, 100_000, 1_000_000):
        write_delta_fallback(batch(change, nxt), base, mode="append")
        nxt += change
        t0 = time.monotonic()
        refresh_agg_mv(spark, base, mv)
        refresh_wall = round(time.monotonic() - t0, 2)
        # full-recompute strawman at the SAME base size (snapshot read —
        # what a scheduled full-refresh job would actually run)
        from polars_incremental_spark.sinks.deltalog import read_delta_fallback

        t0 = time.monotonic()
        full = read_delta_fallback(spark, base)
        recomputed = full.groupBy("g").agg(
            F.count("*").cast("long").alias("cnt"), F.sum("x").alias("sum_x")
        )
        recomputed.write.format("noop").mode("overwrite").save()
        recompute_wall = round(time.monotonic() - t0, 2)
        step = {
            "change_rows": change,
            "refresh_sec": refresh_wall,
            "full_recompute_sec": recompute_wall,
            "speedup": round(recompute_wall / refresh_wall, 2)
            if refresh_wall
            else None,
        }
        results["steps"].append(step)
        print(f"  {step}", file=sys.stderr)

    # retraction window: delete a slice (bounded re-aggregation path)
    delete_where(spark, base, "g < 50 and x % 2 = 0", write_cdf=True)
    t0 = time.monotonic()
    refresh_agg_mv(spark, base, mv)
    results["delete_refresh_sec"] = round(time.monotonic() - t0, 2)
    print(f"  delete window: {results['delete_refresh_sec']}s", file=sys.stderr)

    # ---- join-MV twin (round-9: the flat-in-base-size claim was measured
    # for agg MVs only; same architecture, now same evidence) ----
    from polars_incremental_spark.mv import create_join_mv, refresh_join_mv
    from polars_incremental_spark.sinks.deltalog import read_delta_fallback

    lp, rp, jmv = f"{root}/jleft", f"{root}/jright", f"{root}/jmv"
    n_dim = 10_000

    def fact_batch(n, start):
        return spark.range(start, start + n).select(
            (F.col("id") % n_dim).cast("long").alias("k"),
            (F.col("id") * 7 % 1000).cast("long").alias("x"),
        )

    write_delta_fallback(fact_batch(base_rows, 0), lp)
    write_delta_fallback(
        spark.range(n_dim).select(
            F.col("id").alias("k"),
            (F.col("id") % 50).cast("long").alias("tag"),
        ),
        rp,
    )
    t0 = time.monotonic()
    create_join_mv(spark, lp, rp, jmv, on=["k"])
    results["join_create_sec"] = round(time.monotonic() - t0, 2)
    results["join_steps"] = []
    nxt = base_rows
    for change in (1_000, 10_000, 100_000, 1_000_000):
        write_delta_fallback(fact_batch(change, nxt), lp, mode="append")
        nxt += change
        t0 = time.monotonic()
        refresh_join_mv(spark, jmv)
        refresh_wall = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        recomputed = (
            read_delta_fallback(spark, lp)
            .join(read_delta_fallback(spark, rp), "k")
            .groupBy("k", "x", "tag")
            .agg(F.count("*").alias("mult"))
        )
        recomputed.write.format("noop").mode("overwrite").save()
        recompute_wall = round(time.monotonic() - t0, 2)
        step = {
            "change_rows": change,
            "refresh_sec": refresh_wall,
            "full_recompute_sec": recompute_wall,
            "speedup": round(recompute_wall / refresh_wall, 2)
            if refresh_wall
            else None,
        }
        results["join_steps"].append(step)
        print(f"  join {step}", file=sys.stderr)
    # right-side (dim) change: exercises the L₁⋈ΔR delta term
    delete_where(spark, rp, "k < 10", write_cdf=True)
    t0 = time.monotonic()
    refresh_join_mv(spark, jmv)
    results["join_dim_delete_refresh_sec"] = round(time.monotonic() - t0, 2)
    print(
        f"  join dim-delete window: {results['join_dim_delete_refresh_sec']}s",
        file=sys.stderr,
    )

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
