"""An ANN index maintained BY the incremental Pipeline — the streaming
complement to examples/ann_serving.py (build/append by hand) and the ANN
twin of examples/incremental_mv.py.

The shape: embedding batches arrive as parquet files in a landing
directory; ``Pipeline.run`` plans unseen files, and the writer folds each
batch into a persisted IVF index via ``append_to_ivf_index(batch_id=...)``
— whose exactly-once guard is what makes the pipeline CRASH-SAFE: if the
process dies between the index append and the checkpoint commit, the next
run replays the SAME batch id and the append is a no-op (the index never
double-counts candidates).  The demo stages exactly that crash.

Run:  python examples/incremental_ann.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark import FilesSource, Pipeline
from polars_incremental_spark.functions import ann_index as ai
from polars_incremental_spark.session import get_spark
from polars_incremental_spark.tables import load_table


def main() -> None:
    spark = get_spark("incremental-ann-demo")
    root = tempfile.mkdtemp(prefix="pis_incr_ann_")
    landing = os.path.join(root, "landing")
    idx = os.path.join(root, "ivf")
    ckpt = os.path.join(root, "ckpt")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    try:
        # ---- nightly build seeds the index from the historical corpus
        base = emb.filter(F.col("vec_id") % 3 == 0)
        # batch_id=-1: the seed build occupies its OWN id so the
        # pipeline's batch 0 is not mistaken for an already-folded replay
        meta = ai.build_ivf_index(
            spark, base, idx, n_cells=8, refine_iters=1, batch_id=-1
        )
        print(f"built index: {meta['n_cells']} cells over base corpus")

        # ---- new embedding batches land as files
        emb.filter(F.col("vec_id") % 3 == 1).write.parquet(f"{landing}/b1")

        crash_once = {"armed": False}

        def writer(df, batch_id):
            folded = ai.append_to_ivf_index(spark, df, idx, batch_id=batch_id)
            if crash_once["armed"]:
                crash_once["armed"] = False
                # die AFTER the index append, BEFORE the checkpoint commit
                raise RuntimeError("simulated crash post-append")
            return {"folded": bool(folded)}

        pipe = Pipeline(
            source=FilesSource(path=landing), checkpoint_dir=ckpt, writer=writer
        )
        print("run 1:", pipe.run(spark))

        # ---- crash-replay: a batch lands, the writer appends it to the
        # index, then the process dies before the commit.  The rerun
        # replays the SAME batch id; the frozen-model append refuses the
        # duplicate and the commit completes.
        emb.filter(F.col("vec_id") % 3 == 2).write.parquet(f"{landing}/b2")
        crash_once["armed"] = True
        try:
            pipe.run(spark)
        except Exception as exc:
            print(f"crashed as staged: {exc}")
        print("replay:", pipe.run(spark))  # same batch, append no-ops

        # every vector indexed exactly once despite the crash
        n_emb = emb.count()
        n_idx = spark.read.parquet(os.path.join(idx, "assignments")).count()
        print(f"index rows {n_idx} == corpus rows {n_emb}")
        assert n_idx == n_emb

        # ---- serve against the maintained index
        queries = emb.limit(2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        ai.ivf_index_search(spark, idx, queries, k=3, n_probe=3).show()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
