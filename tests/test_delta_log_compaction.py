"""Log compaction files (<start>.<end>.compacted.json): the commit
tail between checkpoints collapses to one file that snapshot replay
substitutes for the whole range.  JSON commits stay the source of truth —
compaction never deletes them or extends reconstructibility; expire_log
reclaims compacted files once a checkpoint summarizes their range."""

import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.sinks.deltalog import (
    checkpoint_log,
    compact_log_range,
    delete_where,
    expire_log,
    read_delta_fallback,
    set_table_properties,
    write_delta_fallback,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )


def _rows(spark, path, version=None):
    return sorted(
        (r["k"], r["v"])
        for r in read_delta_fallback(spark, path, version=version).collect()
    )


def _build(spark, path):
    """0: create, 1-2: appends, 3: DV delete, 4: append, 5: overwrite-free
    append — a mixed 6-commit history."""
    write_delta_fallback(_df(spark, 0, 10), path)
    write_delta_fallback(_df(spark, 10, 20), path, mode="append")
    write_delta_fallback(_df(spark, 20, 30), path, mode="append")
    set_table_properties(path, {"delta.enableDeletionVectors": "true"})
    delete_where(spark, path, "k in (5, 15)")
    write_delta_fallback(_df(spark, 30, 35), path, mode="append")


def test_compacted_range_substitutes_and_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    before = _rows(spark, path)
    head = DeltaLog(path).latest_version()
    out = compact_log_range(path, 1, head)
    assert os.path.basename(out).endswith(".compacted.json")
    log = DeltaLog(path)
    assert log.compacted_ranges() == [(1, head)]
    # substitution active: the covered JSON commits are never OPENED —
    # corrupting one (existence intact, so reconstructibility holds) must
    # not affect the read
    victim = os.path.join(path, "_delta_log", f"{2:020d}.json")
    orig = open(victim).read()
    open(victim, "w").write("{corrupt")
    try:
        assert _rows(spark, path) == before
        # control: without the compacted file the same read must hit the
        # corrupt commit and fail
        os.rename(out, out + ".hidden")
        with pytest.raises(Exception):
            _rows(spark, path)
        os.rename(out + ".hidden", out)
    finally:
        open(victim, "w").write(orig)
    # time travel BELOW the range end still reads per-version commits
    assert _rows(spark, path, version=2) == sorted(
        (k, k % 7) for k in range(30)
    )


def test_partial_range_and_tail_commits_compose(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    compact_log_range(path, 1, 3)
    write_delta_fallback(_df(spark, 35, 40), path, mode="append")
    assert _rows(spark, path) == sorted(
        (k, k % 7) for k in range(40) if k not in (5, 15)
    )


def test_compaction_preserves_dv_and_domains(spark, tmp_path):
    from polars_incremental_spark.sinks.deltalog import enable_row_tracking

    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 20), path, row_tracking=True)
    set_table_properties(path, {"delta.enableDeletionVectors": "true"})
    delete_where(spark, path, "k = 3")
    write_delta_fallback(_df(spark, 20, 25), path, mode="append")
    ids_before = {
        r["k"]: r["_row_id"]
        for r in read_delta_fallback(spark, path, row_ids=True).collect()
    }
    head = DeltaLog(path).latest_version()
    compact_log_range(path, 0, head)
    # DV descriptor and baseRowId travel inside the compacted add actions
    ids_after = {
        r["k"]: r["_row_id"]
        for r in read_delta_fallback(spark, path, row_ids=True).collect()
    }
    assert ids_after == ids_before and 3 not in ids_after


def test_expire_reclaims_summarized_compactions(spark, tmp_path):
    path = str(tmp_path / "t")
    _build(spark, path)
    head = DeltaLog(path).latest_version()
    out = compact_log_range(path, 1, head - 1)
    checkpoint_log(path)
    removed = expire_log(path)
    assert out in removed and not os.path.exists(out)
    assert _rows(spark, path) == sorted(
        (k, k % 7) for k in range(35) if k not in (5, 15)
    )


def test_compact_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 5), path)
    write_delta_fallback(_df(spark, 5, 8), path, mode="append")
    with pytest.raises(ValueError, match="invalid compaction range"):
        compact_log_range(path, 1, 1)
    with pytest.raises(ValueError, match="invalid compaction range"):
        compact_log_range(path, 0, 9)
