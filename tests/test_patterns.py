"""Tests for the W1-W5 stateful patterns, iter_new_files, and lock takeover."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from polars_incremental_spark import patterns
from polars_incremental_spark.checkpoints.file import commit_new_files, iter_new_files
from polars_incremental_spark.errors import PipelineLockError
from polars_incremental_spark.pipeline import PipelineLock
from polars_incremental_spark.state import JobState


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


@pytest.fixture()
def events(spark):
    rows = [
        (1, ts(0), "a"),
        (2, ts(10), "b"),
        (3, ts(20), "a"),
        (4, ts(17), "b"),  # 3 min late vs max — inside 5-minute lateness
        (5, ts(5), "a"),  # 15 min late — beyond lateness
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "key"])


def test_w1_drop_late(events):
    kept = {r["event_id"] for r in patterns.drop_late(events, "ts", "5 minutes").collect()}
    assert kept == {3, 4}


def test_w1_watermark_monotonic_across_batches(spark, events, tmp_path):
    state = JobState(str(tmp_path / "state"))
    patterns.save_watermark(events, "ts", state)
    # a later batch containing only old data: stored watermark still applies
    old_batch = spark.createDataFrame([(9, ts(1), "a")], ["event_id", "ts", "key"])
    kept = patterns.drop_late(old_batch, "ts", "5 minutes", state=state).collect()
    assert kept == []


def test_w2_route_late(events):
    on_time, late = patterns.route_late(events, "ts", "5 minutes")
    assert {r["event_id"] for r in on_time.collect()} == {3, 4}
    assert {r["event_id"] for r in late.collect()} == {1, 2, 5}


def test_w3_incremental_aggregate(spark, tmp_path):
    state = JobState(str(tmp_path / "state"))
    b1 = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"])
    out1 = {r["k"]: r for r in patterns.incremental_aggregate(
        b1, ["k"], {"v": "sum"}, state=state).collect()}
    assert out1["a"]["v_sum"] == 3.0 and out1["b"]["v_sum"] == 5.0
    b2 = spark.createDataFrame([("a", 10.0), ("c", 1.0)], ["k", "v"])
    out2 = {r["k"]: r for r in patterns.incremental_aggregate(
        b2, ["k"], {"v": "sum"}, state=state).collect()}
    assert out2["a"]["v_sum"] == 13.0 and out2["b"]["v_sum"] == 5.0 and out2["c"]["v_sum"] == 1.0


def test_w4_cross_batch_dedupe(spark, tmp_path):
    state = JobState(str(tmp_path / "state"))
    b1 = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y2")], ["id", "v"])
    out1 = patterns.cross_batch_dedupe(b1, ["id"], state=state)
    assert {r["id"] for r in out1.collect()} == {1, 2}
    b2 = spark.createDataFrame([(2, "z"), (3, "w")], ["id", "v"])
    out2 = patterns.cross_batch_dedupe(b2, ["id"], state=state)
    assert {r["id"] for r in out2.collect()} == {3}
    # re-collecting after the state swap must not change the answer
    assert {r["id"] for r in out2.collect()} == {3}


def test_w5_upsert_latest(spark):
    existing = spark.createDataFrame([(1, ts(0), "old"), (2, ts(0), "keep")], ["k", "ts", "v"])
    batch = spark.createDataFrame(
        [(1, ts(5), "mid"), (1, ts(9), "new"), (3, ts(1), "add")], ["k", "ts", "v"]
    )
    out = {r["k"]: r["v"] for r in patterns.upsert_latest(batch, existing, ["k"], "ts").collect()}
    assert out == {1: "new", 2: "keep", 3: "add"}


# ----------------------------------------------------------- iter_new_files


def test_iter_new_files_offset_written_commit_left_to_caller(spark, tmp_path):
    src = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    spark.range(3).write.mode("overwrite").parquet(str(src / "f1.parquet"))

    first = iter_new_files(str(src), ckpt, pattern="*.parquet", recursive=True)
    assert len(first) > 0
    # offset written but not committed → same pending batch replays
    again = iter_new_files(str(src), ckpt, pattern="*.parquet", recursive=True)
    assert again == first

    assert commit_new_files(ckpt) is True
    assert commit_new_files(ckpt) is False  # nothing pending anymore
    assert iter_new_files(str(src), ckpt, pattern="*.parquet", recursive=True) == []

    spark.range(2).write.mode("overwrite").parquet(str(src / "f2.parquet"))
    new = iter_new_files(str(src), ckpt, pattern="*.parquet", recursive=True)
    assert new and all("f2.parquet" in p for p in new)


# ------------------------------------------------------------- lock takeover


def test_file_lock_stale_pid_takeover(tmp_path):
    ckpt = str(tmp_path)
    lock_path = os.path.join(ckpt, ".pipeline.lock")
    # simulate a SIGKILLed holder: PID that cannot exist
    with open(lock_path, "w") as fh:
        fh.write("pid=999999999\nacquired_at=0\n")
    with PipelineLock(ckpt, timeout_s=2, mode="file", stale_seconds=300):
        with open(lock_path) as fh:
            assert f"pid={os.getpid()}" in fh.read()
    assert not os.path.exists(lock_path)


def test_file_lock_live_holder_blocks(tmp_path):
    ckpt = str(tmp_path)
    with open(os.path.join(ckpt, ".pipeline.lock"), "w") as fh:
        fh.write(f"pid={os.getpid()}\nacquired_at={__import__('time').time()}\n")
    with pytest.raises(PipelineLockError):
        with PipelineLock(ckpt, timeout_s=0.3, mode="file", stale_seconds=300):
            pass


def test_file_lock_age_takeover_without_pid(tmp_path):
    ckpt = str(tmp_path)
    lock_path = os.path.join(ckpt, ".pipeline.lock")
    with open(lock_path, "w") as fh:
        fh.write("acquired_at=1000.0\n")  # ancient
    with PipelineLock(ckpt, timeout_s=2, mode="file", stale_seconds=60):
        pass
    assert not os.path.exists(lock_path)
