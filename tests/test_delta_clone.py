"""SHALLOW CLONE: zero-copy snapshots whose log references the source's
data files by absolute path.  The clone is an independent table from v0;
its DML copy-on-writes INTO the clone, and its vacuum can never reclaim
shared source files."""

import os

from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.sinks.delta import delete_rows, read_table, write_table
from polars_incremental_spark.sinks.deltalog import (
    clone_table,
    set_table_properties,
    vacuum_fallback,
    write_delta_fallback,
)


def _source(spark, path):
    write_table(
        spark.range(100)
        .select(F.col("id").alias("x"), (F.col("id") % 4).alias("g"))
        .repartitionByRange(2, "x"),
        path,
    )


def test_clone_reads_equal_source_with_zero_copies(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _source(spark, src)
    res = clone_table(src, dst)
    assert res == {"files_referenced": 2, "source_version": 0, "version": 0}
    # zero data files inside the clone directory
    data_files = [
        n
        for _r, _d, files in os.walk(dst)
        for n in files
        if n.endswith(".parquet") and "_delta_log" not in _r
    ]
    assert data_files == []
    a = sorted(tuple(r) for r in read_table(spark, src).collect())
    b = sorted(tuple(r) for r in read_table(spark, dst).collect())
    assert a == b


def test_clone_appends_do_not_touch_source(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _source(spark, src)
    clone_table(src, dst)
    write_delta_fallback(
        spark.createDataFrame([(1000, 9)], "x long, g long"), dst, mode="append"
    )
    assert read_table(spark, dst).count() == 101
    assert read_table(spark, src).count() == 100


def test_clone_dml_rewrites_into_clone(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _source(spark, src)
    clone_table(src, dst)
    res = delete_rows(spark, dst, "x >= 25")  # partial hit on file [0,49]
    assert res["rows_deleted"] == 75 and res["files_rewritten"] >= 1
    assert read_table(spark, dst).count() == 25
    assert read_table(spark, src).count() == 100  # source untouched
    # the surviving rewrite landed INSIDE the clone directory
    log = DeltaLog(dst)
    active = [a["path"] for a in log.snapshot_files(log.latest_version())]
    assert any(not os.path.isabs(p) for p in active)  # new clone-local file
    # and clone vacuum never reclaims the shared source files
    removed = vacuum_fallback(dst, retention_hours=0.0)
    assert all(str(tmp_path / "src") not in r for r in removed)
    assert read_table(spark, src).count() == 100


def test_clone_historical_version_and_dv_carry(spark, tmp_path):
    src, dst0, dst1 = (
        str(tmp_path / "src"),
        str(tmp_path / "c0"),
        str(tmp_path / "c1"),
    )
    _source(spark, src)
    set_table_properties(src, {"delta.enableDeletionVectors": "true"})
    delete_rows(spark, src, "g = 1")  # DV delete on the source
    clone_table(src, dst0, version=0)
    assert read_table(spark, dst0).count() == 100  # pre-delete snapshot
    res = clone_table(src, dst1)
    assert read_table(spark, dst1).count() == 75  # DV carried in the clone log
    assert res["files_referenced"] == 2
