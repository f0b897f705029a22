"""Schema evolution (reference tests/test_schema_evolution.py analog):
strict rejects, add_new_columns, coerce + rescue, type widening lattice,
cross-batch schema persistence."""

import pytest
from pyspark.sql import types as T

from polars_incremental_spark import SchemaEvolution, SchemaEvolutionError, apply_schema, widen_types
from polars_incremental_spark.checkpoints.file import FileStreamCheckpoint


def test_widen_lattice():
    assert widen_types(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen_types(T.ByteType(), T.ShortType()) == T.ShortType()
    assert widen_types(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert widen_types(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen_types(T.BooleanType(), T.IntegerType()) == T.IntegerType()
    assert widen_types(T.BooleanType(), T.FloatType()) == T.FloatType()
    assert widen_types(T.StringType(), T.LongType()) == T.StringType()
    assert widen_types(T.IntegerType(), T.IntegerType()) == T.IntegerType()
    with pytest.raises(SchemaEvolutionError):
        widen_types(T.DateType(), T.IntegerType())


def test_strict_rejects_new_column(spark):
    target = T.StructType([T.StructField("a", T.LongType())])
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    with pytest.raises(SchemaEvolutionError):
        apply_schema(df, target, mode="strict")


def test_add_new_columns_and_missing_as_null(spark):
    target = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("gone", T.StringType())]
    )
    df = spark.createDataFrame([(1, 2.5)], ["a", "new"])
    out, schema = apply_schema(df, target, mode="add_new_columns")
    assert out.columns == ["a", "gone", "new"]
    row = out.collect()[0]
    assert row["gone"] is None and row["new"] == 2.5
    assert [f.name for f in schema.fields] == ["a", "gone", "new"]


def test_coerce_with_rescue(spark):
    target = T.StructType([T.StructField("a", T.LongType())])
    df = spark.createDataFrame([("12",), ("oops",)], ["a"])
    out, _ = apply_schema(df, target, mode="coerce", rescue_mode="column")
    rows = out.collect()
    assert {r["a"] for r in rows} == {12, None}
    rescued = {r["_rescued"]["a"] for r in rows}
    assert rescued == {None, "oops"}  # only the failed cast is rescued


def test_type_widen_int_to_double(spark):
    target = T.StructType([T.StructField("v", T.LongType())])
    df = spark.createDataFrame([(1.5,)], ["v"])
    out, schema = apply_schema(df, target, mode="type_widen")
    assert schema["v"].dataType == T.DoubleType()
    assert out.schema["v"].dataType == T.DoubleType()
    assert out.collect()[0]["v"] == 1.5


def test_type_widen_to_string(spark):
    target = T.StructType([T.StructField("v", T.LongType())])
    df = spark.createDataFrame([("abc",)], ["v"])
    out, schema = apply_schema(df, target, mode="type_widen")
    assert schema["v"].dataType == T.StringType()


def test_cross_batch_persistence(spark, tmp_path):
    cp = FileStreamCheckpoint(str(tmp_path / "cp"))
    policy = SchemaEvolution(mode="add_new_columns")
    # batch 1 defines the schema
    b1 = spark.createDataFrame([(1, "x")], ["a", "b"])
    policy.apply(b1, cp)
    assert cp.get_schema() is not None
    # batch 2 brings a new column -> schema grows and persists
    b2 = spark.createDataFrame([(2, "y", 3.0)], ["a", "b", "c"])
    out2 = policy.apply(b2, cp)
    assert out2.columns == ["a", "b", "c"]
    # batch 3 misses a column -> typed null, schema order kept
    b3 = spark.createDataFrame([(3,)], ["a"])
    out3 = policy.apply(b3, cp)
    assert out3.columns == ["a", "b", "c"]
    assert out3.collect()[0]["c"] is None


def test_strict_persists_and_rejects_later_drift(spark, tmp_path):
    cp = FileStreamCheckpoint(str(tmp_path / "cp"))
    policy = SchemaEvolution(mode="strict")
    policy.apply(spark.createDataFrame([(1,)], ["a"]), cp)
    with pytest.raises(SchemaEvolutionError):
        policy.apply(spark.createDataFrame([(1, 2)], ["a", "b"]), cp)


def test_explicit_schema_ddl(spark):
    policy = SchemaEvolution(mode="coerce", schema="a BIGINT, b STRING")
    df = spark.createDataFrame([("1", 2)], ["a", "b"])
    out = policy.apply(df)
    assert out.schema["a"].dataType == T.LongType()
    assert out.schema["b"].dataType == T.StringType()
