"""Exactly-once CMS index maintenance through the checkpointed pipeline.

The persisted Count-Min index is ADDITIVE, so a replayed batch folding
twice silently corrupts every estimate.  This e2e arms a writer crash
AFTER update_cms_index but BEFORE the output commit, restarts with a
fresh Pipeline, and requires the final index to be cell-identical to an
uninterrupted control run — the manifest's folded-id accounting doing its
job inside the real retry path (not just the unit-level replay test).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark import FilesSource, Pipeline, WriterError
from polars_incremental_spark.functions import sketches as sk
from polars_incremental_spark.functions import text as tx
from polars_incremental_spark.tables import load_table


def _run(spark, sf_dir, root, crash_batch_2):
    landing = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    idx = os.path.join(root, "cms")
    out_dir = os.path.join(root, "out")
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 100).write.parquet(
        os.path.join(landing, "crawl_1.parquet")
    )
    crash_armed = {"armed": False}

    def writer(df, batch_id):
        stream = df.select(
            F.explode(tx.word_shingles(F.col("text"), 3)).alias("shingle")
        )
        sk.update_cms_index(
            stream, idx, key_col="shingle", depth=3, width=512, batch_id=batch_id
        )
        if crash_armed["armed"]:
            crash_armed["armed"] = False
            raise RuntimeError("simulated crash after index fold")
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_{batch_id}")
        )

    def pipe():
        return Pipeline(
            source=FilesSource(path=landing, file_format="parquet"),
            checkpoint_dir=ckpt,
            writer=writer,
        )

    assert pipe().run(spark).batches == 1
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 180)).write.parquet(
        os.path.join(landing, "crawl_2.parquet")
    )
    if crash_batch_2:
        crash_armed["armed"] = True
        with pytest.raises(WriterError):
            pipe().run(spark)
        # restart: same batch id replays; the fold must be a no-op
        assert pipe().run(spark).batches == 1
    else:
        assert pipe().run(spark).batches == 1
    merged, meta = sk.read_cms_index(spark, idx)
    assert meta == {"depth": 3, "width": 512}
    return sorted(map(tuple, merged.collect()))


def test_cms_index_exactly_once_through_pipeline_crash(spark, sf_dir, tmp_path):
    control = _run(spark, sf_dir, str(tmp_path / "control"), crash_batch_2=False)
    crashed = _run(spark, sf_dir, str(tmp_path / "crashed"), crash_batch_2=True)
    assert crashed == control
    # sanity: the index actually holds counts
    assert sum(c for _, _, c in control) > 0


def _run_hll(spark, sf_dir, root, crash_batch_2):
    """Same crash protocol as the CMS run above, on the HLL index store —
    maintains approx-distinct shingles per lang through a writer crash."""
    landing = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    idx = os.path.join(root, "hll")
    out_dir = os.path.join(root, "out")
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 100).write.parquet(
        os.path.join(landing, "crawl_1.parquet")
    )
    crash_armed = {"armed": False}

    def writer(df, batch_id):
        stream = df.select(
            "lang", F.explode(tx.word_shingles(F.col("text"), 3)).alias("shingle")
        )
        sk.update_hll_index(
            stream, idx, group_cols=["lang"], value_col="shingle", batch_id=batch_id
        )
        if crash_armed["armed"]:
            crash_armed["armed"] = False
            raise RuntimeError("simulated crash after index fold")
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_{batch_id}")
        )

    def pipe():
        return Pipeline(
            source=FilesSource(path=landing, file_format="parquet"),
            checkpoint_dir=ckpt,
            writer=writer,
        )

    assert pipe().run(spark).batches == 1
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 180)).write.parquet(
        os.path.join(landing, "crawl_2.parquet")
    )
    if crash_batch_2:
        crash_armed["armed"] = True
        with pytest.raises(WriterError):
            pipe().run(spark)
        assert pipe().run(spark).batches == 1
    else:
        assert pipe().run(spark).batches == 1
    return sorted(
        map(tuple, sk.hll_index_distinct(spark, idx).collect())
    )


def test_hll_index_exactly_once_through_pipeline_crash(spark, sf_dir, tmp_path):
    control = _run_hll(spark, sf_dir, str(tmp_path / "hc"), crash_batch_2=False)
    crashed = _run_hll(spark, sf_dir, str(tmp_path / "hx"), crash_batch_2=True)
    assert crashed == control
    assert all(n > 0 for _, n in control)
