"""Skew toolkit walkthrough: detect hot keys, then fix the two shapes
they break — a shuffled join and a custom Python aggregation.

Runs on the driver testdata (events), with the skew manufactured the
same way the u7b oracle query does: ~40% of rows collapse onto key 0.
Each fix is verified against its naive twin (same results), because the
kit's contract is "change the task balance, never the answer" —
tools/skew_bench.py holds the measured straggler numbers (13.4x -> 2.9x
join, 28.8x -> 2.4x pandas aggregation at 100M rows).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from polars_incremental_spark.functions import skew
from polars_incremental_spark.session import get_spark
from polars_incremental_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def moments(pdf):
    return pd.DataFrame(
        {
            "k": [pdf["k"].iloc[0]],
            "n": [len(pdf)],
            "s": [float(pdf["value"].sum())],
        }
    )


def main() -> None:
    spark = get_spark("skew-toolkit-example")
    events = load_table(spark, SF_DIR, "events")

    # manufacture a hot key: ~40% of rows collapse onto k=0
    fact = events.select(
        F.when(F.pmod(F.col("user_id"), F.lit(5)) < 2, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
        "value",
    )

    # 1. DETECT — the number that predicts the 6-hour stage before it runs
    hot = skew.detect_hot_keys(fact, ["k"], top_n=3).collect()
    print("hot keys (key, rows, share):")
    for r in hot:
        print(f"  k={r['k']}: {r['n_rows']} rows, {r['share']:.1%}")
    assert hot[0]["k"] == 0 and hot[0]["share"] > 0.3

    # 2. SALTED JOIN — same answer as the plain join, balanced tasks
    dim = (
        fact.select("k")
        .distinct()
        .withColumn("bucket", F.pmod(F.col("k"), F.lit(7)).cast("int"))
    )
    plain = {
        (r["bucket"], r["n"])
        for r in fact.join(dim, "k").groupBy("bucket").agg(
            F.count("*").alias("n")
        ).collect()
    }
    salted = {
        (r["bucket"], r["n"])
        for r in skew.salted_join(fact, dim, ["k"], n_salts=8)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain
    print(f"salted_join == plain join on {len(plain)} buckets")

    # 3. TWO-PHASE PANDAS AGG — the no-map-side-combine case: partials
    # per (k, salt) in parallel, tiny JVM-side merge
    two_phase = {
        r["k"]: (r["n"], round(r["s"], 4))
        for r in skew.two_phase_apply_in_pandas(
            fact,
            ["k"],
            moments,
            "k long, n long, s double",
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
            n_salts=8,
        ).collect()
    }
    oneshot = {
        r["k"]: (r["n"], round(r["s"], 4))
        for r in fact.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert two_phase == oneshot
    print(f"two_phase_apply_in_pandas == one-shot agg on {len(oneshot)} keys")
    print("done")


if __name__ == "__main__":
    main()
