"""Optimistic concurrency on the jar-less log: os.link claims a version
atomically (no exists-check TOCTOU), blind appends rebase and retry,
conflicting operations surface CommitConflictError."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.sinks.delta import read_table, write_table
from polars_incremental_spark.sinks.deltalog import (
    CommitConflictError,
    _write_commit,
    add_check_constraint,
    delete_where,
    write_delta_fallback,
)


def test_version_claim_is_atomic(tmp_path):
    log_dir = str(tmp_path / "_delta_log")
    os.makedirs(log_dir)
    _write_commit(log_dir, 0, [{"commitInfo": {"timestamp": 1}}])
    with pytest.raises(CommitConflictError):
        _write_commit(log_dir, 0, [{"commitInfo": {"timestamp": 2}}])
    # the loser's tmp file never lingers
    assert [n for n in os.listdir(log_dir) if ".tmp-" in n] == []


def test_concurrent_appends_all_land(spark, tmp_path):
    """Two threads racing appends: every batch commits exactly once, the
    version chain is contiguous, and the table holds every row."""
    path = str(tmp_path / "t")
    write_table(spark.createDataFrame([(0,)], "x long"), path)
    errors = []

    def appender(base):
        try:
            for i in range(4):
                write_delta_fallback(
                    spark.createDataFrame([(base + i,)], "x long"),
                    path,
                    mode="append",
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=appender, args=(100,)),
        threading.Thread(target=appender, args=(200,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    log = DeltaLog(path)
    assert log.versions() == list(range(9))  # 1 create + 8 appends, no gaps
    rows = sorted(r["x"] for r in read_table(spark, path).collect())
    assert rows == [0] + list(range(100, 104)) + list(range(200, 204))


def test_append_rebase_revalidates_new_constraints(spark, tmp_path):
    """A constraint added BETWEEN an append's plan and its commit must
    still reject a violating batch on rebase."""
    path = str(tmp_path / "t")
    write_table(spark.createDataFrame([(1,)], "x long"), path)
    from polars_incremental_spark.sinks import deltalog as dl

    real_commit = dl._write_commit
    state = {"first": True}

    def racing_commit(log_dir, version, actions):
        if state["first"] and any("add" in a for a in actions):
            state["first"] = False
            # interleave: another writer installs a constraint at this
            # version before our append lands
            add_check_constraint(spark, path, "x_small", "x < 100")
        return real_commit(log_dir, version, actions)

    dl._write_commit = racing_commit
    try:
        from polars_incremental_spark.errors import ConstraintViolationError

        with pytest.raises(ConstraintViolationError, match="x_small"):
            write_delta_fallback(
                spark.createDataFrame([(500,)], "x long"), path, mode="append"
            )
    finally:
        dl._write_commit = real_commit
    assert read_table(spark, path).count() == 1


def test_overwrite_conflict_surfaces(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark.createDataFrame([(1,)], "x long"), path)
    from polars_incremental_spark.sinks import deltalog as dl

    real_commit = dl._write_commit
    state = {"first": True}

    def racing_commit(log_dir, version, actions):
        if state["first"] and any("remove" in a for a in actions):
            state["first"] = False
            real_commit(
                log_dir, version, [{"commitInfo": {"timestamp": 1}}]
            )
        return real_commit(log_dir, version, actions)

    dl._write_commit = racing_commit
    try:
        with pytest.raises(CommitConflictError):
            write_delta_fallback(
                spark.createDataFrame([(2,)], "x long"), path, mode="overwrite"
            )
    finally:
        dl._write_commit = real_commit


def test_dml_conflict_surfaces(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark.createDataFrame([(1,), (2,)], "x long"), path)
    from polars_incremental_spark.sinks import deltalog as dl

    real_commit = dl._write_commit
    state = {"first": True}

    def racing_commit(log_dir, version, actions):
        op = next(
            (a["commitInfo"].get("operation") for a in actions if "commitInfo" in a),
            None,
        )
        if state["first"] and op == "DELETE":
            state["first"] = False
            real_commit(log_dir, version, [{"commitInfo": {"timestamp": 1}}])
        return real_commit(log_dir, version, actions)

    dl._write_commit = racing_commit
    try:
        with pytest.raises(CommitConflictError):
            delete_where(spark, path, "x = 1")
    finally:
        dl._write_commit = real_commit
    # the failed DELETE changed nothing
    assert read_table(spark, path).count() == 2


def test_append_races_dml_consistently(spark, tmp_path):
    """An append thread racing a DELETE: the append always lands (rebase),
    the DELETE either wins its version or surfaces a conflict — never a
    torn table."""
    path = str(tmp_path / "t")
    write_table(
        spark.createDataFrame([(i,) for i in range(50)], "x long"), path
    )
    results = {}

    def do_appends():
        try:
            for i in range(3):
                write_delta_fallback(
                    spark.createDataFrame([(1000 + i,)], "x long"),
                    path,
                    mode="append",
                )
            results["append"] = "ok"
        except Exception as exc:  # noqa: BLE001
            results["append"] = exc

    def do_delete():
        try:
            results["delete"] = delete_where(spark, path, "x < 10")
        except CommitConflictError:
            results["delete"] = "conflict"

    ta = threading.Thread(target=do_appends)
    td = threading.Thread(target=do_delete)
    ta.start(); td.start(); ta.join(); td.join()
    assert results["append"] == "ok"
    rows = {r["x"] for r in read_table(spark, path).collect()}
    assert {1000, 1001, 1002} <= rows  # every append landed
    if results["delete"] == "conflict":
        assert set(range(50)) <= rows  # delete cleanly aborted
    else:
        assert rows.isdisjoint(set(range(10)))  # delete cleanly applied
    log = DeltaLog(path)
    vs = log.versions()
    assert vs == list(range(vs[-1] + 1))  # contiguous chain, no gaps
