"""Regression tests for the round-2 behavior fixes (VERDICT/ADVICE items)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from polars_incremental_spark.catalog import DatasetSpec
from polars_incremental_spark.cdc import apply_cdc
from polars_incremental_spark.errors import SchemaEvolutionError
from polars_incremental_spark.schema import SchemaEvolution, apply_schema
from polars_incremental_spark.sinks.delta import apply_cdc_table


def _changes(spark, rows):
    return spark.createDataFrame(rows, ["k", "v", "_change_type", "_commit_version"])


def test_cdc_unmapped_codes_are_not_upserts(spark):
    """An unmapped custom change code must neither upsert nor delete."""
    existing = spark.createDataFrame([(1, "old"), (2, "old2")], ["k", "v"])
    ch = _changes(spark, [(1, "new", "weird_code", 1), (2, "new2", "update", 1)])
    out = {r["k"]: r["v"] for r in apply_cdc(ch, existing, keys=["k"]).collect()}
    assert out == {1: "old", 2: "new2"}


def test_cdc_preimage_kept_is_not_upserted(spark):
    existing = spark.createDataFrame([(1, "old")], ["k", "v"])
    ch = _changes(
        spark,
        [(1, "pre", "update_preimage", 1), (1, "post", "update_postimage", 1)],
    )
    out = apply_cdc(
        ch, existing, keys=["k"], ignore_update_preimage=False
    ).collect()
    assert {r["v"] for r in out} == {"post"}


def test_cdc_delete_applies_with_empty_target_no_dedupe(spark):
    """existing=None + dedupe off: delete keys still remove same-batch inserts."""
    ch = _changes(spark, [(1, "a", "insert", 1), (1, None, "delete", 2), (2, "b", "insert", 1)])
    out = {r["k"] for r in apply_cdc(ch, None, keys=["k"], dedupe_by_latest_commit=False).collect()}
    assert out == {2}


def test_schema_add_new_columns_rejects_type_change(spark):
    df = spark.createDataFrame([("1",)], ["a"])
    target = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(SchemaEvolutionError, match="type change"):
        apply_schema(df, target, mode="add_new_columns")


def test_schema_coerce_still_casts(spark):
    df = spark.createDataFrame([("1",), ("oops",)], ["a"])
    target = T.StructType([T.StructField("a", T.LongType())])
    out, _ = apply_schema(df, target, mode="coerce")
    vals = [r["a"] for r in out.collect()]
    assert 1 in vals and None in vals


def test_schema_strict_rejects_missing_column(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    target = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    with pytest.raises(SchemaEvolutionError, match="missing"):
        apply_schema(df, target, mode="strict")


def test_catalog_to_schema_evolution():
    spec = DatasetSpec(
        name="d", format="parquet", path="/tmp/x",
        options={"schema_mode": "coerce", "rescue_mode": "column"},
    )
    ev = spec.to_schema_evolution()
    assert isinstance(ev, SchemaEvolution)
    assert ev.mode == "coerce" and ev.rescue_mode == "column"
    assert DatasetSpec(name="d", format="parquet", path="/tmp/x").to_schema_evolution() is None


def test_apply_cdc_table_compute_counts_off(spark, tmp_path):
    target = str(tmp_path / "t")
    ch = _changes(spark, [(1, "a", "insert", 1)])
    res = apply_cdc_table(
        spark, ch, target, keys=["k"], compute_counts=False
    )
    assert res["rows_in"] is None and res["rows_out"] is None
    assert {r["k"] for r in spark.read.parquet(target).collect()} == {1}
