"""Measure the skew kit (functions/skew.py) against a DELIBERATELY
Zipf-skewed corpus — the round-8 ask: salted_join and two_phase_agg were
designed for skew but never measured against adversarial data.

Fixture (deterministic, numpy PCG64 seed 777): a fact table where ONE key
holds ~10% of all rows (the hot-key shape that serializes a sort-merge
task) and a dim table of every key.  Broadcast is disabled for the join
runs: at the 100 TB design point the dim side is assumed too large to
broadcast — broadcast-hash joins never shuffle the probe side, so skew
only exists once the join degrades to sort-merge.

Three join configs measure the same inner join + grouped reduction:
  naive_noaqe  — sort-merge, AQE skew-split OFF (the 6-hour-stage shape)
  naive_aqe    — sort-merge, AQE skew-split ON (the session default)
  salted       — skew.salted_join on (k, salt), dim replicated n_salts x

Two agg families:
  collect_plain / collect_two_phase — collect_list with the LISTS
    materialized.  The expected (and measured) result is that two-phase
    CANNOT win here: list state is conserved through every merge, so the
    hot key's full volume funnels into one phase-2 task regardless, and
    the salt layer only adds a shuffle.  Recorded as the honest negative
    bound on when to reach for the kit.
  pandas_plain / pandas_two_phase — a CUSTOM PYTHON aggregation
    (groupBy().applyInPandas computing per-key moment stats).  Python
    UDAFs have NO map-side combine at all: plain ships every hot-key row
    into ONE Arrow batch in one worker; two-phase computes partials per
    (k, salt) in parallel and merges the tiny partials JVM-side.  This is
    the kit's real use case in an LLM pipeline (custom per-group scoring).

All runs use 256 shuffle partitions, not the session's cores=32 default:
at the 100 TB design point tasks outnumber per-executor cores many times
over, and 32-tasks-on-32-cores makes every task the straggler — the skew
only becomes visible (and fixable) when the median task is small.

Per-config output: wall seconds + the reduce stage's max/median task time
from the Spark UI REST API (taskSummary quantiles) — the max/median ratio
IS the skew, independent of machine speed.

Usage: python tools/skew_bench.py [n_rows] [out_dir]
       default 100_000_000 rows, .scaledata/skew (gitignored)
Prints one JSON line; paste the numbers into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SHARE = 0.10
N_KEYS = 200_000
N_SALTS = 32


def gen(n_rows: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    fact_path = os.path.join(out_dir, "fact.parquet")
    dim_path = os.path.join(out_dir, "dim.parquet")
    if os.path.exists(fact_path) and os.path.exists(dim_path):
        if pq.read_metadata(fact_path).num_rows == n_rows:
            print(f"reusing fixture in {out_dir}", file=sys.stderr)
            return
    rng = np.random.default_rng(777)
    n_hot = int(n_rows * HOT_SHARE)
    keys = np.concatenate(
        [
            np.zeros(n_hot, dtype=np.int64),  # THE hot key
            rng.integers(1, N_KEYS + 1, size=n_rows - n_hot, dtype=np.int64),
        ]
    )
    rng.shuffle(keys)
    values = rng.random(n_rows) * 100.0
    pq.write_table(
        pa.table({"k": keys, "v": values}), fact_path, row_group_size=1_000_000
    )
    dim_keys = np.arange(0, N_KEYS + 1, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "k": dim_keys,
                "bucket": (dim_keys % 1000).astype(np.int32),
                # padding so the dim is not trivially tiny on disk; the
                # join configs disable broadcast regardless (see module doc)
                "pad": np.array(["x" * 64] * len(dim_keys)),
            }
        ),
        dim_path,
    )
    print(f"wrote {n_rows:,}-row fixture to {out_dir}", file=sys.stderr)


def _task_skew(spark, group: str) -> dict:
    """Per-task timing truth for the SHUFFLE-READ (reduce) stage of the
    jobs in ``group`` — the stage key skew serializes.  Identified as the
    stage with the largest shuffleReadBytes (the scan stage reads input,
    the reduce stage reads shuffle); its taskSummary quantiles give the
    max/median task-time ratio, which IS the skew independent of machine
    speed."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    stage_ids = set()
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info:
            stage_ids.update(info.stageIds)
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def _get(path):
        try:
            with urllib.request.urlopen(base + path, timeout=10) as r:
                return json.loads(r.read())
        except Exception:
            return None  # skipped / not-run stages 404

    reduce_stage, reduce_bytes = None, -1
    for sid in stage_ids:
        data = _get(f"/stages/{sid}/0")
        if not data:
            continue
        sr = data.get("shuffleReadBytes", 0)
        if sr > reduce_bytes:
            reduce_stage, reduce_bytes = data, sr
    if reduce_stage is None:
        return {}
    sid = reduce_stage["stageId"]
    q = _get(f"/stages/{sid}/0/taskSummary?quantiles=0.0,0.5,1.0")
    if not q:
        return {}
    _lo, med, hi = q["executorRunTime"]
    out = {
        "stage": sid,
        "n_tasks": reduce_stage.get("numCompleteTasks"),
        "shuffle_read_mb": round(reduce_bytes / 1e6, 1),
        "task_ms_median": med,
        "task_ms_max": hi,
    }
    if med > 0:
        out["max_over_median"] = round(hi / med, 2)
    return out


def _pd_stats(pdf):
    import pandas as pd

    return pd.DataFrame(
        {
            "k": [pdf["k"].iloc[0]],
            "n": [len(pdf)],
            "s": [float(pdf["v"].sum())],
            "ss": [float((pdf["v"] ** 2).sum())],
        }
    )


def _run(spark, name: str, df_fn) -> dict:
    spark.sparkContext.setJobGroup(name, name)
    t0 = time.monotonic()
    df_fn().write.format("noop").mode("overwrite").save()
    wall = round(time.monotonic() - t0, 2)
    out = {"wall_sec": wall, **_task_skew(spark, name)}
    spark.sparkContext.setJobGroup("", "")
    print(f"  {name}: {out}", file=sys.stderr)
    return out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scaledata/skew"
    gen(n_rows, out_dir)

    from pyspark.sql import functions as F

    from polars_incremental_spark.functions import skew
    from polars_incremental_spark.session import get_spark

    spark = get_spark(
        "skew-bench",
        shuffle_partitions=256,  # tasks >> cores, like a real cluster
        extra_conf={
            "spark.ui.enabled": "true",  # REST taskSummary is the metric
            # the 100 TB scenario under measurement: dim too large to
            # broadcast, so the join is a shuffled sort-merge
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    fact = spark.read.parquet(os.path.join(out_dir, "fact.parquet"))
    dim = spark.read.parquet(os.path.join(out_dir, "dim.parquet")).drop("pad")

    def reduced(joined):
        return joined.groupBy("bucket").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )

    results: dict[str, dict] = {}
    # warm-up (JIT, parquet footers) — not recorded
    fact.agg(F.sum("v")).collect()

    # AQE fully OFF for the naive/salted pair: adaptive coalescing would
    # merge the 256 reduce partitions back to ~cores (measured 256 -> 34)
    # and hide exactly the tasks>>cores shape under test; the aqe config
    # then shows what the session default buys for free on the same plan
    aqe_off = {"spark.sql.adaptive.enabled": "false"}
    aqe_on = {"spark.sql.adaptive.enabled": "true"}

    def with_conf(conf: dict, fn):
        saved = {k: spark.conf.get(k) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            return fn()
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

    results["join_naive_noaqe"] = with_conf(
        aqe_off,
        lambda: _run(spark, "join_naive_noaqe", lambda: reduced(fact.join(dim, "k"))),
    )
    results["join_naive_aqe"] = with_conf(
        aqe_on,
        lambda: _run(spark, "join_naive_aqe", lambda: reduced(fact.join(dim, "k"))),
    )
    results["join_salted"] = with_conf(
        aqe_off,
        lambda: _run(
            spark,
            "join_salted",
            lambda: reduced(skew.salted_join(fact, dim, ["k"], n_salts=N_SALTS)),
        ),
    )

    # the LISTS themselves go through the noop sink (size(collect_list)
    # alone would let Catalyst rewrite the agg to a count and erase the
    # high-cardinality state this config exists to measure)
    def collect_plain():
        return fact.groupBy("k").agg(F.collect_list("v").alias("vals"))

    def collect_two_phase():
        return skew.two_phase_agg(
            fact,
            ["k"],
            [F.collect_list("v").alias("pv")],
            [F.flatten(F.collect_list("pv")).alias("vals")],
            n_salts=N_SALTS,
        )

    results["collect_plain"] = with_conf(
        aqe_off, lambda: _run(spark, "collect_plain", collect_plain)
    )
    results["collect_two_phase"] = with_conf(
        aqe_off, lambda: _run(spark, "collect_two_phase", collect_two_phase)
    )

    # custom Python aggregation — the no-map-side-combine case.  Sliced to
    # the hot key + 1000 uniform keys so the measurement isolates the hot
    # group's serialization (the full-corpus run is dominated by 200k
    # per-group Python-call overheads, a different, salt-proof cost)
    stats_schema = "k long, n long, s double, ss double"
    hot_slice = fact.filter(F.col("k") <= 1000)

    def pandas_plain():
        return hot_slice.groupBy("k").applyInPandas(_pd_stats, stats_schema)

    def pandas_two_phase():
        return skew.two_phase_apply_in_pandas(
            hot_slice,
            ["k"],
            _pd_stats,
            stats_schema,
            [
                F.sum("n").alias("n"),
                F.sum("s").alias("s"),
                F.sum("ss").alias("ss"),
            ],
            n_salts=N_SALTS,
        )

    results["pandas_plain"] = with_conf(
        aqe_off, lambda: _run(spark, "pandas_plain", pandas_plain)
    )
    results["pandas_two_phase"] = with_conf(
        aqe_off, lambda: _run(spark, "pandas_two_phase", pandas_two_phase)
    )

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "hot_share": HOT_SHARE,
                "n_keys": N_KEYS,
                "n_salts": N_SALTS,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
