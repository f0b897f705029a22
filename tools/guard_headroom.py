"""Report the pre-flight candidate-volume guard estimates (the d17/d18
Σdf·(df-1)/2 budget check, dedup._guard_candidate_volume) at a given
SF dir — the data SCALING.md cites to state, from measurement, whether
the exact pair-enumeration operators run or correctly refuse at each
scale, and how much headroom remains under the 1e9 default budget.

Usage: python tools/guard_headroom.py [sf_dir ...]
       (default: /root/testdata/sf0.1 and .scaledata/sf1 if present)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_BUDGET = 1_000_000_000


def main(dirs: list[str]) -> None:
    from pyspark.sql import functions as F

    from polars_incremental_spark.functions.dedup import shingle_posting_list
    from polars_incremental_spark.session import get_spark
    from polars_incremental_spark.tables import load_table

    spark = get_spark("guard-headroom")
    out = {}
    for sf_dir in dirs:
        docs = load_table(spark, sf_dir, "documents")
        dfreq = (
            shingle_posting_list(docs, "text", "doc_id", n=3)
            .groupBy("shingle_hash")
            .agg(F.count("*").alias("__df"))
        )
        row = dfreq.agg(
            F.sum(F.col("__df").cast("double") * (F.col("__df") - 1) / 2).alias("c"),
            F.max("__df").alias("m"),
            F.count("*").alias("n_shingles"),
        ).collect()[0]
        est = int(row["c"] or 0)
        out[sf_dir] = {
            "candidate_pairs_est_d17": est,           # pairs_per_collision=1
            "candidate_pairs_est_d18": est * 2,       # directional, both orders
            "max_doc_freq_seen": int(row["m"] or 0),
            "n_distinct_shingles": int(row["n_shingles"]),
            "budget": DEFAULT_BUDGET,
            "d17_headroom_x": round(DEFAULT_BUDGET / max(est, 1), 2),
            "d18_headroom_x": round(DEFAULT_BUDGET / max(est * 2, 1), 2),
        }
        print(json.dumps({sf_dir: out[sf_dir]}), file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        d for d in ("/root/testdata/sf0.1", ".scaledata/sf1") if os.path.exists(d)
    ]
    main(dirs)
