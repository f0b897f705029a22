"""Randomized DML-storm fuzz for CDF reconstruction (round 11).

Two tables receive the IDENTICAL random DML sequence (appends, deletes,
updates; deletion vectors toggled per table) — one writes change-data
files (`write_cdf=True`), the other never does.  After every commit the
reconstructed feed must equal the real feed in SIGNED-BAG terms (the
representation every counting consumer reduces to), and on a row-tracked
OR keys=-declared table the reconstructed feed must match the real
feed's change types EXACTLY (paired update images).

Seeded per run from a fixed list so failures replay.
"""

from __future__ import annotations

import random

import pytest

# round-13 test tiering: randomized fuzz/stress campaign — slow tier
# (directed tests + the DuckDB oracle gate cover the same operators)
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from polars_incremental_spark.sinks.deltalog import (
    delete_where,
    enable_row_tracking,
    read_change_feed,
    read_delta_fallback,
    set_table_properties,
    update_where,
    write_delta_fallback,
)


def _signed_bag(df):
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    rows = (
        df.withColumn("_s", sign)
        .groupBy("k", "g", "x")
        .agg(F.sum("_s").alias("net"))
        .filter(F.col("net") != 0)
        .collect()
    )
    return {(r["k"], r["g"], r["x"]): r["net"] for r in rows}


def _typed_rows(df):
    return sorted(
        (r["_change_type"], r["k"], r["g"], r["x"])
        for r in df.select("_change_type", "k", "g", "x").collect()
    )


@pytest.mark.parametrize(
    "seed,row_tracked,keyed",
    [
        (11, False, False),
        (42, True, False),
        (77, False, False),
        # round 12: keys=["k"] on a NON-row-tracked base must restore
        # exactly-paired update images through the whole storm
        (123, False, True),
        (7, False, True),
    ],
)
def test_dml_storm_reconstruction_matches_cdf_twin(
    spark, tmp_path, seed, row_tracked, keyed
):
    rng = random.Random(seed)
    a = str(tmp_path / "with_cdf")  # ground truth: real change files
    b = str(tmp_path / "without_cdf")  # reconstruction target
    rows = [(i, "abc"[i % 3], float(i)) for i in range(60)]
    for p in (a, b):
        write_delta_fallback(
            spark.createDataFrame(rows, "k long, g string, x double"), p
        )
    if row_tracked:
        enable_row_tracking(a)
        enable_row_tracking(b)
    if rng.random() < 0.5:
        # DV route on ONE side only: route choice must not affect the feed
        set_table_properties(b, {"delta.enableDeletionVectors": "true"})
    next_k = 60
    for _step in range(8):
        op = rng.choice(["append", "delete", "update", "delete", "update"])
        if op == "append":
            n = rng.randint(1, 10)
            batch = [
                (next_k + i, "abc"[(next_k + i) % 3], float(next_k + i))
                for i in range(n)
            ]
            next_k += n
            for p in (a, b):
                write_delta_fallback(
                    spark.createDataFrame(batch, "k long, g string, x double"),
                    p,
                    mode="append",
                )
        elif op == "delete":
            mod, rem = rng.randint(3, 9), rng.randint(0, 2)
            cond = f"k % {mod} = {rem}"
            ra = delete_where(spark, a, cond, write_cdf=True)
            rb = delete_where(spark, b, cond)
            assert (ra["version"] is None) == (rb["version"] is None)
            if rb["version"] is None:
                continue
        else:
            mod, rem = rng.randint(3, 9), rng.randint(0, 2)
            cond = f"k % {mod} = {rem}"
            delta = rng.randint(1, 500)
            ra = update_where(spark, a, cond, {"x": f"x + {delta}"}, write_cdf=True)
            rb = update_where(spark, b, cond, {"x": f"x + {delta}"})
            assert (ra["version"] is None) == (rb["version"] is None)
            if rb["version"] is None:
                continue
        va, vb = ra["version"] if op != "append" else None, None
        # compare THIS commit's feed (append commits produce identical
        # version streams on both tables only if the DML no-op'd the same
        # way — asserted above — so per-commit versions line up)
        if op != "append":
            cdf = read_change_feed(
                spark, a, starting_version=va, ending_version=va
            )
            rec = read_change_feed(
                spark,
                b,
                starting_version=rb["version"],
                ending_version=rb["version"],
                reconstruct_removes=True,
                keys=["k"] if keyed else None,
            )
            assert _signed_bag(cdf) == _signed_bag(rec), (
                f"seed={seed} step={_step} op={op} cond={cond}"
            )
            if row_tracked or keyed:
                assert _typed_rows(cdf) == _typed_rows(rec), (
                    f"seed={seed} step={_step} op={op} cond={cond} "
                    "(row-tracked/keyed: change types must pair exactly)"
                )
    # final sanity: both tables converged to the same snapshot
    sa = sorted(tuple(r) for r in read_delta_fallback(spark, a).collect())
    sb = sorted(tuple(r) for r in read_delta_fallback(spark, b).collect())
    assert sa == sb
