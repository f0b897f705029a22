"""Build-once / serve-many ANN over embeddings — the production split.

The in-query ANN entries (s5/s5b/s12) train their index inside the query
so the correctness oracle can replay training.  A real corpus does it the
way this example does: TRAIN nightly, APPEND new vectors as they arrive
(frozen models, exactly-once per batch), SERVE many query batches against
the stored artifact, paying I/O only for the probed cells.

Run:  python examples/ann_serving.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark.functions import ann_index as ai
from polars_incremental_spark.session import get_spark
from polars_incremental_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ann-serving-example")
    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="ann_example_")

    try:
        # ---- nightly build: train coarse cells + PQ codebooks, store CODES
        idx = f"{root}/ivfpq"
        base = emb.filter(F.col("vec_id") % 10 != 0)
        meta = ai.build_ivfpq_index(
            spark, base, idx,
            n_cells=8, refine_iters=1, n_sub=4, n_codes=16, pq_iters=1,
        )
        print(f"built: {meta['n_cells']} cells, "
              f"{meta['n_sub']}x{meta['n_codes']} codebooks, "
              f"payload = id + {meta['n_sub']} bytes/vector")

        # ---- incremental arrival: append under FROZEN models; the second
        # call is the Pipeline-retry shape and must be a no-op
        fresh = emb.filter(F.col("vec_id") % 10 == 0)
        assert ai.append_to_ivfpq_index(spark, fresh, idx, batch_id=1)
        assert not ai.append_to_ivfpq_index(spark, fresh, idx, batch_id=1)
        print("appended batch 1 (replay correctly refused)")

        # ---- serving: probe 2 of 8 cells — only those partition dirs are
        # even listed; scoring is 4 LUT lookups per candidate
        queries = emb.limit(3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        hits = ai.ivfpq_index_search(spark, idx, queries, k=3, n_probe=2)
        hits.show(truncate=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
