"""Regression tests for round-3 ADVICE fixes.

Covers: file-lock race-safety (live-PID locks never age-broken, exit only
unlinks own token), asof_join row-consistent payload carry, salted_join
how-validation, vacuum_fallback reclaiming _change_data files.
"""

from __future__ import annotations

import os
import time

import pytest

from polars_incremental_spark.errors import PipelineLockError
from polars_incremental_spark.pipeline import PipelineLock


# ---------------------------------------------------------------- salted_join


def test_salted_join_rejects_right_and_full_outer(spark):
    """ADVICE r2: right/full-outer would replicate unmatched small rows
    n_salts times; such join types must raise instead of returning wrong rows."""
    from polars_incremental_spark.functions.skew import salted_join

    large = spark.createDataFrame([(1, "x")], ["k", "v"])
    small = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "w"])
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="large-side-preserving"):
            salted_join(large, small, ["k"], how=how)
    # the preserved types still work
    assert salted_join(large, small, ["k"], how="left").count() == 1
    assert salted_join(large, small, ["k"], how="left_anti").count() == 0


# ------------------------------------------------------------ vacuum CDF files


def test_vacuum_fallback_reclaims_expired_change_data(spark, tmp_path):
    """ADVICE r2: _change_data/ files must be reclaimed once their commit
    falls out of retention — not accumulate forever."""
    from polars_incremental_spark.sinks.deltalog import (
        read_delta_fallback,
        vacuum_fallback,
        write_delta_fallback,
    )
    from pyspark.sql import functions as F

    table = str(tmp_path / "tbl")
    df = spark.range(5).withColumnRenamed("id", "k")
    cdc = df.withColumn("_change_type", F.lit("insert"))
    write_delta_fallback(df, table, mode="append", cdc_df=cdc)
    cdc_dir = os.path.join(table, "_change_data")
    assert os.listdir(cdc_dir)  # change files exist

    # within retention: nothing removed
    assert vacuum_fallback(table, retention_hours=168.0) == []
    assert os.listdir(cdc_dir)

    # retention 0: the commit is outside the window -> cdc files reclaimed,
    # snapshot data files kept (still active)
    removed = vacuum_fallback(table, retention_hours=0.0)
    assert any("_change_data" in p for p in removed)
    assert [n for n in os.listdir(cdc_dir) if n.endswith(".parquet")] == []
    assert read_delta_fallback(spark, table).count() == 5


# ------------------------------------------------------------------ asof join


def test_asof_join_null_payload_not_backfilled(spark):
    """ADVICE r2: when the matched right row has a NULL payload field, the
    output must keep that NULL — not back-fill it from an older right row
    (which would silently mix columns from different rows)."""
    import datetime as dt

    from polars_incremental_spark.functions.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame([(1, "a", t(10))], ["event_id", "k", "ts"])
    # older right row has v='old', newer (matched) row has v=NULL
    right = spark.createDataFrame(
        [("a", t(5), "old", 50.0), ("a", t(8), None, 80.0)],
        "k string, ts timestamp, v string, score double",
    )
    row = asof_join(left, right, on=["k"]).collect()[0]
    assert row["ts_r"] == t(8)
    assert row["score_r"] == 80.0
    assert row["v_r"] is None  # NOT 'old'


# --------------------------------------------------------------------- locks


def test_file_lock_live_pid_never_age_broken(tmp_path):
    """ADVICE r2: a lock whose holder PID is alive must not be broken on age
    alone — a 6-minute Spark batch must keep its lock past the 300s default."""
    ckpt = str(tmp_path)
    lock_path = os.path.join(ckpt, ".pipeline.lock")
    with open(lock_path, "w") as fh:
        fh.write(f"pid={os.getpid()}\nacquired_at=0\n")  # ancient but alive
    with pytest.raises(PipelineLockError):
        with PipelineLock(ckpt, timeout_s=0.3, mode="file", stale_seconds=1):
            pass
    assert os.path.exists(lock_path)  # still held, not stolen


def test_file_lock_exit_does_not_unlink_foreign_lock(tmp_path):
    """ADVICE r2: on exit, only unlink the lock if our own token is still in
    it — never remove a lock that a (pathological) takeover replaced."""
    ckpt = str(tmp_path)
    lock_path = os.path.join(ckpt, ".pipeline.lock")
    lock = PipelineLock(ckpt, timeout_s=1, mode="file")
    lock.__enter__()
    foreign = "pid=999999998\nacquired_at=%s\nnonce=feedface\n" % time.time()
    with open(lock_path, "w") as fh:
        fh.write(foreign)
    lock.__exit__(None, None, None)
    with open(lock_path) as fh:
        assert fh.read() == foreign  # foreign holder's lock untouched


def test_file_lock_acquire_verifies_own_token(tmp_path):
    """The winner of an O_EXCL create writes a unique nonce and re-reads the
    file — so the held lock always carries this process's token."""
    ckpt = str(tmp_path)
    lock_path = os.path.join(ckpt, ".pipeline.lock")
    with PipelineLock(ckpt, timeout_s=1, mode="file") as lock:
        content = open(lock_path).read()
        assert f"pid={os.getpid()}" in content
        assert "nonce=" in content
        assert lock._token == content
    assert not os.path.exists(lock_path)


def test_file_lock_lost_takeover_race_restores_fresh_lock(tmp_path):
    """Round-3 review: waiter A judges content C stale, waiter B completes a
    takeover and creates a fresh lock, THEN A acts on its stale judgement.
    A's rename moves B's fresh lock, detects the mismatch, restores it via
    os.link, and times out — B's lock must survive byte-for-byte and A must
    not end up a holder."""
    ckpt = str(tmp_path)
    lock_path = os.path.join(ckpt, ".pipeline.lock")
    stale = "pid=999999999\nacquired_at=1.0\nnonce=deadbeef\n"

    # B's completed takeover: a fresh, live lock sits at the path
    b = PipelineLock(ckpt, timeout_s=1, mode="file", stale_seconds=5)
    b.__enter__()
    fresh = open(lock_path).read()

    class PreemptedWaiter(PipelineLock):
        """A whose first read returns the stale content it saw pre-takeover."""

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._first = True

        def _read_lock(self):
            if self._first:
                self._first = False
                return stale
            return super()._read_lock()

    a = PreemptedWaiter(ckpt, timeout_s=0.5, mode="file", stale_seconds=5)
    with pytest.raises(PipelineLockError):
        a.__enter__()
    assert open(lock_path).read() == fresh  # B's lock survived the lost race
    b.__exit__(None, None, None)
    assert not os.path.exists(lock_path)


def test_file_lock_reclaims_own_restored_token(tmp_path, monkeypatch):
    """Round-3 review: A's fresh lock is displaced by a racing waiter and
    then restored via os.link — A's next O_EXCL create fails, but the file
    at the path carries A's OWN nonce token.  A must reclaim it (it is the
    holder) instead of spinning against its own live PID until deadline."""
    import uuid as uuid_mod
    from types import SimpleNamespace

    import polars_incremental_spark.pipeline as plmod

    ckpt = str(tmp_path)
    lock_path = os.path.join(ckpt, ".pipeline.lock")
    monkeypatch.setattr(uuid_mod, "uuid4", lambda: SimpleNamespace(hex="cafebabe"))
    monkeypatch.setattr(plmod.time, "time", lambda: 42.0)
    token = f"pid={os.getpid()}\nacquired_at=42.0\nnonce=cafebabe\n"
    with open(lock_path, "w") as fh:
        fh.write(token)  # the restored copy of A's own fresh lock
    lock = PipelineLock(ckpt, timeout_s=1, mode="file", stale_seconds=300)
    with lock:
        assert lock._owns_file and lock._token == token
    assert not os.path.exists(lock_path)


# -------------------------------------------------------------- bench_compare


def test_bench_compare_disjoint_and_zero_baseline(tmp_path):
    """Round-3 review: disjoint query sets (no shared total) and a 0.0s
    baseline entry must report cleanly, not raise ZeroDivisionError."""
    import json
    import subprocess
    import sys

    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"queries": {"a": 1.0}}))
    new.write_text(json.dumps({"queries": {"b": 2.0}}))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_compare.py"),
         str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and "no shared queries" in r.stdout

    old.write_text(json.dumps({"queries": {"a": 0.0}}))
    new.write_text(json.dumps({"queries": {"a": 2.0}}))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_compare.py"),
         str(old), str(new)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1 and "REGRESSED" in r.stdout
