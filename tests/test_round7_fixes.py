"""Round-7 regression tests for the advisor-reported defects.

1. Append conflict-rebase vs concurrent enable_row_tracking(): if the
   feature enablement wins the race, a blindly-rebased append would commit
   adds WITHOUT baseRowId on a now-row-tracked table (spec requires one on
   every add) and skip the rowIdHighWaterMark advance — the rebase must
   surface CommitConflictError instead.
2. read_change_feed timestamp bounds resolve against MONOTONIC-adjusted
   commit timestamps (running max) — real Delta's rule.  A later commit
   whose raw commitInfo stamp dips below a predecessor is lifted, so the
   window semantics stay consistent with version ranges.
3. Pipeline.eager_fail_expectations=True raises a violated fail-rule
   BEFORE the writer runs (the plain-append-writer safety mode); the
   default keeps the zero-extra-scan observe path.

Reference parity: the reference delegates Delta concurrency to delta-rs
(sinks/delta.py) and has no expectations layer; these pin OUR semantics.
"""

import json
import os

import pytest

from polars_incremental_spark import FilesSource, Pipeline
from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.expectations import (
    ExpectationViolationError,
    expect_or_fail,
)
from polars_incremental_spark.sinks.delta import read_table, write_table
from polars_incremental_spark.sinks.deltalog import (
    CommitConflictError,
    enable_row_tracking,
    read_change_feed,
    write_delta_fallback,
)


def test_append_rebase_surfaces_concurrent_row_tracking_enable(spark, tmp_path):
    """enable_row_tracking() winning the commit race must FAIL the rebase,
    not let unstamped adds land on a row-tracked table."""
    path = str(tmp_path / "t")
    write_table(spark.createDataFrame([(1,)], "x long"), path)
    from polars_incremental_spark.sinks import deltalog as dl

    real_commit = dl._write_commit
    state = {"first": True}

    def racing_commit(log_dir, version, actions):
        if state["first"] and any("add" in a for a in actions):
            state["first"] = False
            # interleave: another writer enables row tracking at this
            # version before our (unstamped) append lands
            enable_row_tracking(path)
        return real_commit(log_dir, version, actions)

    dl._write_commit = racing_commit
    try:
        with pytest.raises(CommitConflictError):
            write_delta_fallback(
                spark.createDataFrame([(2,)], "x long"), path, mode="append"
            )
    finally:
        dl._write_commit = real_commit
    # the table is intact and still spec-valid: one row, tracking on
    assert read_table(spark, path).count() == 1
    # a re-run append (now seeing tracking enabled) stamps and lands
    write_delta_fallback(
        spark.createDataFrame([(2,)], "x long"), path, mode="append"
    )
    log = DeltaLog(path)
    adds = [
        a["add"]
        for v in log.versions()
        for a in log.actions(v)
        if "add" in a and a["add"].get("dataChange", True)
    ]
    assert all("baseRowId" in a for a in adds[-1:]), "re-run append unstamped"


def _restamp(path: str, stamps: dict[int, int]) -> None:
    """Rewrite commitInfo.timestamp in the given log versions — simulates
    non-ICT concurrent writers whose wall clocks dip."""
    log_dir = os.path.join(path, "_delta_log")
    for version, ts in stamps.items():
        fp = os.path.join(log_dir, f"{version:020d}.json")
        lines = []
        with open(fp) as fh:
            for line in fh:
                action = json.loads(line)
                if "commitInfo" in action:
                    action["commitInfo"]["timestamp"] = ts
                    action["commitInfo"].pop("inCommitTimestamp", None)
                lines.append(json.dumps(action))
        with open(fp, "w") as fh:
            fh.write("\n".join(lines) + "\n")


def test_cdf_timestamp_bounds_use_monotonic_adjustment(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark.createDataFrame([(0,)], "x long"), path)
    for x in (1, 2):
        write_delta_fallback(
            spark.createDataFrame([(x,)], "x long"),
            path,
            mode="append",
        )
    # raw stamps dip at v2: monotonic adjustment lifts it to 5000
    _restamp(path, {0: 1000, 1: 5000, 2: 3000})
    # bound between v2's raw stamp and its ADJUSTED stamp: v2 is excluded
    # (its effective commit time is 5000), window ends at v0
    got = read_change_feed(
        spark, path, starting_version=0, ending_timestamp_ms=3500
    )
    assert sorted(r["x"] for r in got.collect()) == [0]
    # bound at the adjusted stamp: both v1 and v2 fall inside
    got = read_change_feed(
        spark, path, starting_version=0, ending_timestamp_ms=5000
    )
    assert sorted(r["x"] for r in got.collect()) == [0, 1, 2]
    # starting bound sees the same adjusted clock: first version at/after
    # 3500 is v1 (raw 5000), and v2 rides along as part of the tail
    got = read_change_feed(spark, path, starting_timestamp_ms=3500)
    assert sorted(r["x"] for r in got.collect()) == [1, 2]


@pytest.fixture()
def neg_src(spark, tmp_path):
    d = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10.0), (2, -5.0)], "id long, v double"
    ).coalesce(1).write.parquet(f"{d}/p0")
    return d


def test_eager_fail_expectations_block_the_writer(spark, neg_src, tmp_path):
    calls = []

    def writer(df, batch_id):
        calls.append(df.count())

    pipe = Pipeline(
        source=FilesSource(path=neg_src),
        checkpoint_dir=str(tmp_path / "cp"),
        writer=writer,
        expectations=[expect_or_fail("v_pos", "v > 0")],
        eager_fail_expectations=True,
    )
    with pytest.raises(ExpectationViolationError, match="v_pos: 1 rows"):
        pipe.run(spark)
    assert calls == [], "eager mode must raise BEFORE the writer runs"


def test_default_fail_expectations_still_observe_after_write(
    spark, neg_src, tmp_path
):
    calls = []

    def writer(df, batch_id):
        calls.append(df.count())

    pipe = Pipeline(
        source=FilesSource(path=neg_src),
        checkpoint_dir=str(tmp_path / "cp"),
        writer=writer,
        expectations=[expect_or_fail("v_pos", "v > 0")],
    )
    with pytest.raises(ExpectationViolationError):
        pipe.run(spark)
    assert calls == [2], "default mode keeps the zero-extra-scan path"
