"""Multi-part log checkpoints (<v>.checkpoint.<part>.<parts>.parquet):
a single checkpoint file of a huge table is a driver-memory / single-
stream-IO bottleneck, so the spec splits the action set across parts.
Readers must treat a multi-part set as usable ONLY when complete — a
crash mid-write leaves a partial set that must never seed a replay."""

import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.errors import PlanningError
from polars_incremental_spark.sinks.deltalog import (
    checkpoint_log,
    expire_log,
    read_delta_fallback,
    write_delta_fallback,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _parts(path):
    log_dir = os.path.join(path, "_delta_log")
    return sorted(
        n for n in os.listdir(log_dir) if ".checkpoint." in n and n.endswith(".parquet")
    )


def test_multipart_checkpoint_roundtrip_and_expiry(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 50).repartition(6), path, row_tracking=True)
    write_delta_fallback(_df(spark, 50, 80).repartition(4), path, mode="append")
    before = sorted(map(tuple, read_delta_fallback(spark, path).collect()))
    ids_before = sorted(
        r["_row_id"]
        for r in read_delta_fallback(spark, path, row_ids=True).collect()
    )
    checkpoint_log(path, parts=3)
    names = _parts(path)
    assert len(names) == 3 and all(".0000000003.parquet" in n for n in names)
    assert not any(n.endswith(".checkpoint.parquet") for n in names)
    log = DeltaLog(path)
    assert log.checkpoint_versions() == [1]
    expire_log(path)
    assert DeltaLog(path).versions() == []  # JSON all summarized away
    after = sorted(map(tuple, read_delta_fallback(spark, path).collect()))
    assert after == before
    # row tracking (add fields + domain metadata) survives the split form
    ids_after = sorted(
        r["_row_id"]
        for r in read_delta_fallback(spark, path, row_ids=True).collect()
    )
    assert ids_after == ids_before
    # appends continue from the checkpoint-carried state
    write_delta_fallback(_df(spark, 80, 90), path, mode="append")
    assert read_delta_fallback(spark, path).count() == 90


def test_incomplete_part_set_never_seeds(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 30).repartition(4), path)
    checkpoint_log(path, parts=4)
    log_dir = os.path.join(path, "_delta_log")
    victim = next(n for n in _parts(path) if ".0000000002." in n)
    os.unlink(os.path.join(log_dir, victim))
    log = DeltaLog(path)
    # incomplete set is invisible to discovery...
    assert log.checkpoint_versions() == []
    # ...and the JSON commits still serve reads (checkpoint unused)
    assert read_delta_fallback(spark, path).count() == 30
    # but a direct actions fetch fails loudly instead of shrinking the table
    with pytest.raises(PlanningError, match="incomplete"):
        log.checkpoint_actions(0)


def test_parts_clamped_to_row_count(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 5).coalesce(1), path)
    checkpoint_log(path, parts=64)  # rows: protocol+metaData+1 add = 3
    names = _parts(path)
    assert len(names) == 3  # clamped; every part non-empty
    assert DeltaLog(path).checkpoint_versions() == [0]
    expire_log(path)
    assert read_delta_fallback(spark, path).count() == 5


def test_later_single_checkpoint_supersedes_multipart(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 10), path)
    checkpoint_log(path, parts=2)
    write_delta_fallback(_df(spark, 10, 20), path, mode="append")
    checkpoint_log(path)  # single-file at v1
    log = DeltaLog(path)
    assert log.checkpoint_versions() == [0, 1]
    removed = expire_log(path)
    # superseded multi-part files (v0) went with the cleanup
    assert all(".0000000002.parquet" not in os.path.basename(p) for p in _parts(path))
    assert any(".checkpoint.0000000001.0000000002.parquet" in p for p in removed)
    assert read_delta_fallback(spark, path).count() == 20
