"""MERGE INTO on the jar-less path: the general three-clause merge,
file-selective (only files containing matched keys rewrite), with Delta's
multiple-match guard, constraint/generated-column enforcement, and full
CDF emission."""

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.errors import ConstraintViolationError
from polars_incremental_spark.sinks.delta import read_table, write_table
from polars_incremental_spark.sinks.deltalog import (
    add_check_constraint,
    merge_into,
    write_delta_fallback,
)


@pytest.fixture()
def target(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.range(100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(4, "k"),
        path,
    )
    return path


def test_merge_upsert_rewrites_only_hit_files(spark, target):
    log = DeltaLog(target)
    before = {a["path"] for a in log.snapshot_files(log.latest_version())}
    source = spark.createDataFrame(
        [(5, 500.0), (7, 700.0), (1000, 1.0)], "k long, v double"
    )
    res = merge_into(
        spark, target, source, keys=["k"],
        when_matched_update={"v": "src.v"},
    )
    assert res["rows_updated"] == 2 and res["rows_inserted"] == 1
    after = {a["path"] for a in log.snapshot_files(log.latest_version())}
    # keys 5 and 7 live in the SAME range file -> exactly one file rewrote
    # (plus one new insert file)
    assert len(before & after) == len(before) - 1
    rows = {r["k"]: r["v"] for r in read_table(spark, target).collect()}
    assert rows[5] == 500.0 and rows[7] == 700.0 and rows[1000] == 1.0
    assert rows[6] == 6.0  # untouched neighbor carried byte-equal
    assert len(rows) == 101


def test_merge_matched_delete_clause_order(spark, target):
    # WHEN MATCHED AND cond THEN DELETE evaluates before the update clause
    source = spark.createDataFrame(
        [(1, -1.0), (2, 20.0)], "k long, v double"
    )
    res = merge_into(
        spark, target, source, keys=["k"],
        when_matched_delete="src.v < 0",
        when_matched_update={"v": "src.v"},
        when_not_matched_insert=False,
    )
    assert res["rows_deleted"] == 1 and res["rows_updated"] == 1
    assert res["rows_inserted"] == 0
    rows = {r["k"]: r["v"] for r in read_table(spark, target).collect()}
    assert 1 not in rows and rows[2] == 20.0 and len(rows) == 99


def test_merge_multiple_match_aborts(spark, target):
    source = spark.createDataFrame(
        [(5, 1.0), (5, 2.0)], "k long, v double"
    )
    v = DeltaLog(target).latest_version()
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(
            spark, target, source, keys=["k"],
            when_matched_update={"v": "src.v"},
        )
    assert DeltaLog(target).latest_version() == v  # nothing committed


def test_merge_insert_only_and_noop(spark, target):
    source = spark.createDataFrame([(200, 2.0)], "k long, v double")
    res = merge_into(spark, target, source, keys=["k"])
    assert res["rows_inserted"] == 1 and res["rows_updated"] == 0
    # a source that changes nothing commits nothing
    res2 = merge_into(
        spark, target,
        spark.createDataFrame([], "k long, v double"),
        keys=["k"],
    )
    assert res2["version"] is None


def test_merge_update_expression_mixes_target_and_source(spark, target):
    source = spark.createDataFrame([(3, 100.0)], "k long, v double")
    merge_into(
        spark, target, source, keys=["k"],
        when_matched_update={"v": "v + src.v"},  # target v + source v
        when_not_matched_insert=False,
    )
    rows = {r["k"]: r["v"] for r in read_table(spark, target).collect()}
    assert rows[3] == 103.0


def test_merge_respects_constraints_on_both_paths(spark, target):
    add_check_constraint(spark, target, "v_pos", "v >= 0")
    with pytest.raises(ConstraintViolationError):
        merge_into(
            spark, target,
            spark.createDataFrame([(5, -5.0)], "k long, v double"),
            keys=["k"], when_matched_update={"v": "src.v"},
        )
    with pytest.raises(ConstraintViolationError):
        merge_into(
            spark, target,
            spark.createDataFrame([(999, -1.0)], "k long, v double"),
            keys=["k"],
        )
    assert read_table(spark, target).count() == 100  # both aborted clean


def test_merge_insert_computes_generated_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(
        spark.createDataFrame([(1, 10.0)], "k long, v double").withColumn(
            "v2", F.col("v") * 2
        ),
        path,
        generated_columns={"v2": "v * 2"},
    )
    merge_into(
        spark, path,
        spark.createDataFrame([(2, 20.0)], "k long, v double"),
        keys=["k"],
    )
    rows = {r["k"]: r["v2"] for r in read_table(spark, path).collect()}
    assert rows[2] == 40.0


def test_merge_cdf_emits_full_change_set(spark, target):
    source = spark.createDataFrame(
        [(1, -1.0), (2, 22.0), (500, 5.0)], "k long, v double"
    )
    merge_into(
        spark, target, source, keys=["k"],
        when_matched_delete="src.v < 0",
        when_matched_update={"v": "src.v"},
        write_cdf=True,
    )
    log = DeltaLog(target)
    types = []
    for action in log.actions(log.latest_version()):
        if "cdc" in action:
            for r in spark.read.parquet(
                log.abs_path(action["cdc"]["path"])
            ).collect():
                types.append((r["k"], r["_change_type"]))
    assert (1, "delete") in types
    assert (2, "update_preimage") in types and (2, "update_postimage") in types
    assert (500, "insert") in types


@pytest.mark.parametrize("seed", [3, 17, 41])
def test_merge_upsert_equals_apply_cdc(spark, tmp_path, seed):
    """Coherence: merge_into(update+insert) on random batches must land
    the same final table as the independent apply_cdc merge semantics —
    two implementations of upsert, one answer."""
    import random

    from polars_incremental_spark.cdc import apply_cdc

    rnd = random.Random(seed)
    base = [(k, rnd.randint(0, 99)) for k in rnd.sample(range(50), 30)]
    batch = [(k, rnd.randint(100, 199)) for k in rnd.sample(range(70), 25)]
    path = str(tmp_path / f"t{seed}")
    write_table(spark.createDataFrame(base, "k long, v long"), path)
    merge_into(
        spark, path,
        spark.createDataFrame(batch, "k long, v long"),
        keys=["k"], when_matched_update={"v": "src.v"},
    )
    got = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    expected_df = apply_cdc(
        spark.createDataFrame(
            [(k, v, "update_postimage") for k, v in batch],
            "k long, v long, _change_type string",
        ),
        spark.createDataFrame(base, "k long, v long"),
        keys=["k"],
    )
    want = {r["k"]: r["v"] for r in expected_df.collect()}
    assert got == want
