"""Version diff: post-hoc row-level delta between Delta snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.sinks.delta import (
    delete_rows,
    read_table,
    update_rows,
    write_table,
)
from polars_incremental_spark.sinks.diff import snapshot_diff, table_diff


def _t(spark, path):
    """v0: ids 0..9.  v1: delete id<2.  v2: update v where id>=8;
    append would need merge — use a second update instead."""
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 10).cast("long").alias("v")
    )
    write_table(df, path)                                  # v0
    delete_rows(spark, path, "id < 2")                     # v1
    update_rows(spark, path, "id >= 8", {"v": "v + 1"})    # v2
    return path


def test_table_diff_classifies_changes(spark, tmp_path):
    path = _t(spark, str(tmp_path / "t"))
    d = table_diff(spark, path, keys=["id"], from_version=0, to_version=2)
    got = {(r["_change_type"], r["id"], r["v"]) for r in d.collect()}
    want = {("delete", 0, 0), ("delete", 1, 10)}
    for i in (8, 9):
        want |= {
            ("update_preimage", i, i * 10),
            ("update_postimage", i, i * 10 + 1),
        }
    assert got == want


def test_diff_is_a_valid_patch(spark, tmp_path):
    """Applying the diff to the old snapshot reproduces the new one —
    the property that makes the output trustworthy as an audit/CDC feed."""
    path = _t(spark, str(tmp_path / "t"))
    old = read_table(spark, path, version=0)
    new = read_table(spark, path, version=2)
    d = table_diff(spark, path, keys=["id"], from_version=0, to_version=2)
    gone = d.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select("id")
    added = d.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    patched = old.join(gone, "id", "left_anti").unionByName(added)
    assert sorted(map(tuple, patched.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_diff_net_collapse_and_empty(spark, tmp_path):
    path = _t(spark, str(tmp_path / "t"))
    # same version range end-to-end: empty diff
    assert (
        snapshot_diff(
            read_table(spark, path, version=1),
            read_table(spark, path, version=1),
            ["id"],
        ).count()
        == 0
    )
    # v1 -> v2 sees ONLY the update, not the earlier deletes (net diff)
    d = table_diff(spark, path, keys=["id"], from_version=1, to_version=2)
    assert set(d.select("_change_type").distinct().toPandas()["_change_type"]) == {
        "update_preimage", "update_postimage"
    }


def test_diff_null_safe_keys_and_validation(spark, tmp_path):
    a = spark.createDataFrame([(None, 1), (1, 1)], "k int, v int")
    b = spark.createDataFrame([(None, 2), (1, 1)], "k int, v int")
    d = snapshot_diff(a, b, ["k"])
    got = {(r["_change_type"], r["k"], r["v"]) for r in d.collect()}
    # NULL key row matched null-safely: it's an UPDATE, not delete+insert
    assert got == {("update_preimage", None, 1), ("update_postimage", None, 2)}
    with pytest.raises(ValueError, match="at least one key"):
        snapshot_diff(a, b, [])
    with pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(a, b.withColumnRenamed("v", "w"), ["k"])
    with pytest.raises(ValueError, match="must precede"):
        table_diff(spark, str(tmp_path), keys=["k"], from_version=2, to_version=2)
