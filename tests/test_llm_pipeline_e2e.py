"""Checkpointed multi-batch LLM curation pipeline: crash/restart e2e.

Composes the north-star stages (examples/llm_data_pipeline.py) into a
two-batch checkpointed pipeline and crashes the writer AFTER every
stateful side effect (bloom index append, exact-dedup seen-set swap,
LSH index append, shard write) but BEFORE the output commit — then
restarts with a fresh Pipeline object.  The retried batch must replay
under the SAME batch id and converge to output identical to an
uninterrupted control run: curated rows, LSH index contents, bloom
membership, shard assignment, and exact-dedup state all byte-equivalent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark import (
    FilesSource,
    Pipeline,
    WriterError,
    cross_batch_dedupe,
    write_parquet_batch,
)
from polars_incremental_spark.functions import dedup, layout, sampling
from polars_incremental_spark.functions import text as tx
from polars_incremental_spark.tables import load_table


def _curate(df, state, batch_id, spark, dirs, heldout):
    """Scrub -> quality gate -> persisted-bloom decontaminate ->
    cross-batch exact dedupe -> incremental LSH near-dedupe -> split."""
    scrubbed = df.withColumn("text", tx.redact_pii(F.col("text")))
    kept = scrubbed.withColumn("quality", tx.quality_score(F.col("text"))).filter(
        F.col("quality") >= 0.4
    )
    # this batch's newly-arrived eval docs fold into the PERSISTED bloom
    # index (idempotent per batch_id), then the batch probes the whole
    # accumulated index
    dedup.update_bloom_index(heldout, dirs["bloom"], m_bits=1 << 18, batch_id=batch_id)
    flags = dedup.bloom_decontaminate_indexed(
        spark, kept, dirs["bloom"], min_hits=2
    )
    kept = kept.join(
        flags.filter(F.col("is_flagged")).select("doc_id"), "doc_id", "left_anti"
    )
    kept = kept.withColumn("text_hash", F.md5(F.col("text")))
    kept = cross_batch_dedupe(
        kept, ["text_hash"], state=state, state_key="seen_hashes", batch_id=batch_id
    )
    survivors = dedup.incremental_lsh_dedup(
        kept, dirs["lsh"], threshold=0.6, batch_id=batch_id
    )
    out = sampling.hash_split(
        survivors,
        weights={"train": 0.9, "valid": 0.05, "test": 0.05},
        key_col="doc_id",
    ).select("doc_id", "lang", "quality", "text", "split")
    layout.write_training_shards(
        out, os.path.join(dirs["shards"], f"batch_{batch_id}"),
        key_col="doc_id", n_shards=2,
    )
    return out


def _run_two_batches(spark, sf_dir, root, crash_batch_2=False):
    dirs = {
        name: os.path.join(root, name)
        for name in ("landing", "ckpt", "curated", "lsh", "bloom", "shards")
    }
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 120).write.parquet(
        os.path.join(dirs["landing"], "crawl_1.parquet")
    )
    heldout_slices = {
        0: docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 430)).select(
            "doc_id", "text"
        ),
        1: docs.filter((F.col("doc_id") >= 430) & (F.col("doc_id") < 460)).select(
            "doc_id", "text"
        ),
    }
    crash_armed = {"armed": False}

    def writer(df, state, batch_id):
        out = _curate(df, state, batch_id, spark, dirs, heldout_slices[batch_id])
        if crash_armed["armed"]:
            crash_armed["armed"] = False
            raise RuntimeError("simulated crash before output commit")
        write_parquet_batch(out, dirs["curated"], batch_id)
        return {"accepted": out.count()}

    def new_pipeline():
        # a fresh Pipeline object per run = process restart (checkpoint dir
        # is the only carried state)
        return Pipeline(
            source=FilesSource(path=dirs["landing"], file_format="parquet"),
            checkpoint_dir=dirs["ckpt"],
            writer=writer,
        )

    assert new_pipeline().run(spark).batches == 1

    # second crawl overlaps the first (60-119 repeat; 120-199 new)
    docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 200)).write.parquet(
        os.path.join(dirs["landing"], "crawl_2.parquet")
    )
    if crash_batch_2:
        crash_armed["armed"] = True
        with pytest.raises(WriterError):
            new_pipeline().run(spark)
        # every stateful side effect has already happened; the restart must
        # replay batch 1 and converge anyway
    assert new_pipeline().run(spark).batches == 1
    # a third run sees nothing new — no reprocessing
    assert new_pipeline().run(spark).batches == 0
    return dirs


def _snapshot(spark, dirs):
    def rows(path, cols):
        if not os.path.exists(path):
            return []
        df = spark.read.parquet(path)
        return sorted(map(tuple, df.select(*cols).collect()))

    curated = []
    for d in sorted(os.listdir(dirs["curated"])):
        curated += rows(
            os.path.join(dirs["curated"], d),
            ["doc_id", "lang", "quality", "text", "split"],
        )
    curated.sort()
    lsh = []
    for d in sorted(os.listdir(dirs["lsh"])):
        lsh.append(
            (d, rows(os.path.join(dirs["lsh"], d), ["doc_id", "minhash"]))
        )
    bloom = []
    for d in sorted(os.listdir(dirs["bloom"])):
        if d.startswith("batch_"):
            bloom.append((d, rows(os.path.join(dirs["bloom"], d), ["word", "bits"])))
    shards = []
    for d in sorted(os.listdir(dirs["shards"])):
        shards.append(
            (d, rows(os.path.join(dirs["shards"], d), ["shard", "doc_id"]))
        )
    seen = rows(
        os.path.join(dirs["ckpt"], "state", "seen_hashes.parquet"),
        ["text_hash", "__batch_id"],
    )
    return {"curated": curated, "lsh": lsh, "bloom": bloom, "shards": shards, "seen": seen}


@pytest.mark.slow  # round-13 tiering: long randomized/property probe
def test_llm_pipeline_crash_restart_converges_to_control(spark, sf_dir, tmp_path):
    control = _run_two_batches(spark, sf_dir, str(tmp_path / "control"))
    crashed = _run_two_batches(
        spark, sf_dir, str(tmp_path / "crashed"), crash_batch_2=True
    )
    snap_control = _snapshot(spark, control)
    snap_crashed = _snapshot(spark, crashed)
    for key in ("curated", "lsh", "bloom", "shards", "seen"):
        assert snap_crashed[key] == snap_control[key], f"{key} diverged after replay"
    # sanity on the control semantics themselves
    curated_ids = {r[0] for r in snap_control["curated"]}
    assert curated_ids, "pipeline accepted nothing"
    # batch 2's overlap region (60-119) was exactly-deduped: each doc_id
    # appears once even though it arrived in both crawls
    assert len(curated_ids) == len(snap_control["curated"])
    # both batches contributed LSH signature dirs
    assert [d for d, _ in snap_control["lsh"]] == ["batch_0", "batch_1"]
    # the replayed run recorded seen-hashes with per-batch provenance
    batches_in_state = {b for _, b in snap_control["seen"]}
    assert batches_in_state == {0, 1}


def test_native_streaming_mode_matches_planned_pipeline(spark, sf_dir, tmp_path):
    """SURVEY §7.1 mode parity for the LLM pillar: the SAME curation writer
    (bloom index, exact cross-batch dedupe, incremental LSH, split, shards)
    run through Structured Streaming foreachBatch (run_native, two
    availableNow triggers) converges to the identical curated corpus, LSH
    index, bloom index, shard assignment, and seen-state as the
    planned-mode Pipeline."""
    from polars_incremental_spark.streaming.native import run_native

    planned = _run_two_batches(spark, sf_dir, str(tmp_path / "planned"))

    root = str(tmp_path / "native")
    dirs = {
        name: os.path.join(root, name)
        for name in ("landing", "ckpt", "curated", "lsh", "bloom", "shards")
    }
    docs = load_table(spark, sf_dir, "documents")
    heldout_slices = {
        0: docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 430)).select(
            "doc_id", "text"
        ),
        1: docs.filter((F.col("doc_id") >= 430) & (F.col("doc_id") < 460)).select(
            "doc_id", "text"
        ),
    }

    def writer(df, state, batch_id):
        out = _curate(df, state, batch_id, spark, dirs, heldout_slices[batch_id])
        write_parquet_batch(out, dirs["curated"], batch_id)

    # batch 0: crawl 1 lands as flat part files (file streams don't recurse)
    docs.filter(F.col("doc_id") < 120).coalesce(1).write.mode("overwrite").parquet(
        dirs["landing"]
    )
    spec = FilesSource(path=dirs["landing"], file_format="parquet")
    run_native(spark, spec, dirs["ckpt"], writer)
    # batch 1: overlapping crawl 2 appends new part files; the second
    # availableNow trigger picks up ONLY those
    docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 200)).coalesce(
        1
    ).write.mode("append").parquet(dirs["landing"])
    run_native(spark, spec, dirs["ckpt"], writer)
    # drained: a third trigger processes nothing (no new batch dirs appear)
    n_curated = len(os.listdir(dirs["curated"]))
    run_native(spark, spec, dirs["ckpt"], writer)
    assert len(os.listdir(dirs["curated"])) == n_curated == 2

    snap_planned = _snapshot(spark, planned)
    snap_native = _snapshot(spark, dirs)
    for key in ("curated", "lsh", "bloom", "shards", "seen"):
        assert snap_native[key] == snap_planned[key], f"{key} diverged across modes"
