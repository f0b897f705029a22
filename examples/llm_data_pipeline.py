"""The north-star composition: an incremental LLM training-data pipeline.

Documents land in a drop directory; each checkpointed micro-batch is
quality-filtered (text stats), exactly deduplicated against ALL previously
accepted documents (cross-batch state), near-dup-flagged via MinHash-LSH
within the batch, and appended to a curated Delta table — so downstream
trainers can stream the curated corpus incrementally (Delta source).

Every stage is the same code that runs at 100 TB: hash-keyed shuffles,
no driver-side data loops, Arrow-batched Python only where Catalyst can't
express the op.

Run: python examples/llm_data_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark import (
    DeltaSource,
    FilesSource,
    Pipeline,
    cross_batch_dedupe,
    get_spark,
)
from polars_incremental_spark.functions import dedup
from polars_incremental_spark.functions import text as tx
from polars_incremental_spark.sinks.delta import read_table, write_table
from polars_incremental_spark.tables import load_table


def curate(batch, state, batch_id, lsh_index):
    """Quality-filter → cross-batch exact-dedupe → cross-batch NEAR-dedupe."""
    scored = batch.withColumn("quality", tx.quality_score(F.col("text")))
    kept = scored.filter(F.col("quality") >= 0.5)
    # exact dedupe vs everything accepted in ANY earlier batch
    kept = kept.withColumn("text_hash", F.md5(F.col("text")))
    kept = cross_batch_dedupe(kept, ["text_hash"], state=state, state_key="seen_hashes")
    # near-dup dedupe vs the whole accepted corpus AND within the batch:
    # survivors' minhash signatures append to the persisted LSH index
    # (idempotently per batch_id), so batch N+1 dedupes against them
    return dedup.incremental_lsh_dedup(
        kept, lsh_index, threshold=0.6, batch_id=batch_id
    )


def main() -> None:
    spark = get_spark("llm-data-pipeline")
    work = tempfile.mkdtemp(prefix="pis_llm_")
    land, ckpt, curated, lsh_index = (
        os.path.join(work, d) for d in ("landing", "ckpt", "curated", "lsh_index")
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    docs.filter(F.col("doc_id") < 300).write.parquet(os.path.join(land, "crawl_1.parquet"))

    def writer(df, state, batch_id):
        out = curate(df, state, batch_id, lsh_index)
        write_table(out, curated, mode="append" if os.path.exists(curated) else "overwrite")
        return {"accepted": out.count()}

    pipeline = Pipeline(
        source=FilesSource(path=land, file_format="parquet"),
        checkpoint_dir=ckpt,
        writer=writer,
    )
    print("batch 1:", pipeline.run(spark))
    n1 = read_table(spark, curated).count()
    print(f"curated after batch 1: {n1} docs")

    # second crawl overlaps the first — cross-batch dedupe drops repeats
    docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 500)).write.parquet(
        os.path.join(land, "crawl_2.parquet")
    )
    print("batch 2:", pipeline.run(spark))
    n2 = read_table(spark, curated).count()
    print(f"curated after batch 2: {n2} docs (overlap 200-299 deduped)")

    # downstream trainer streams the curated corpus incrementally
    consumed = []
    Pipeline(
        source=DeltaSource(path=curated, ignore_changes=True),
        checkpoint_dir=os.path.join(work, "trainer_ckpt"),
        writer=lambda df: consumed.append(df.count()),
    ).run(spark)
    print("trainer streamed docs:", sum(consumed))
    assert sum(consumed) == n2
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
