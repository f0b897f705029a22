"""Native delta-spark execution tests — skip-gated on the jar's presence.

This sandbox has no delta-spark jar and no network, so every Delta feature
runs through the jar-less fallback (sinks/deltalog.py) and these tests
SKIP.  The day the environment gains the jar (set SPARK_GRAFT_DELTA_PACKAGE
or install delta-spark), they run the SAME public APIs down the native path
and flip M7 (apply_cdc_table via DeltaTable.merge) from partial to full:

- write -> native MERGE (apply_cdc_table) -> snapshot correctness
- change-data-feed round-trip via spark.read.format("delta") CDF options
- native DELETE through delete_rows

Reference parity: HamiltonCulik/polars-incremental sinks/delta.py:32-158
(delta-rs merge/CDF); here the native engine is delta-spark.
"""

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.sources.delta import delta_available

pytestmark = pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark jar not installed in this environment (jar-less "
    "fallback covered by test_delta*.py); set SPARK_GRAFT_DELTA_PACKAGE "
    "in a networked deployment to exercise the native path",
)


def _write_native(spark, df, path, **options):
    w = df.write.format("delta")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def test_native_apply_cdc_table_merge(spark, tmp_path):
    from polars_incremental_spark.sinks.delta import apply_cdc_table

    path = str(tmp_path / "t")
    _write_native(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        path,
    )
    changes = spark.createDataFrame(
        [(2, "B", "update"), (3, "c", "insert"), (1, None, "delete")],
        "id long, s string, _change_type string",
    )
    res = apply_cdc_table(spark, changes, path, keys=["id"])
    assert res["action"] == "merge"
    rows = sorted(
        (r["id"], r["s"])
        for r in spark.read.format("delta").load(path).collect()
    )
    assert rows == [(2, "B"), (3, "c")]


def test_native_cdf_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    (
        spark.createDataFrame([(1, "a")], "id long, s string")
        .write.format("delta")
        .option("delta.enableChangeDataFeed", "true")
        .save(path)
    )
    spark.createDataFrame([(2, "b")], "id long, s string").write.format(
        "delta"
    ).mode("append").save(path)
    cdf = (
        spark.read.format("delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load(path)
    )
    types = {r["_change_type"] for r in cdf.collect()}
    assert "insert" in types


def test_native_delete_rows(spark, tmp_path):
    from polars_incremental_spark.sinks.delta import delete_rows

    path = str(tmp_path / "t")
    _write_native(
        spark, spark.range(10).select(F.col("id").alias("x")), path
    )
    res = delete_rows(spark, path, "x >= 5")
    assert res.get("native") is True
    assert spark.read.format("delta").load(path).count() == 5
