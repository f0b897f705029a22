"""DESCRIBE DETAIL twin, domain tombstoning, and CDF timestamp bounds."""

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.sinks.deltalog import (
    checkpoint_log,
    enable_in_commit_timestamps,
    expire_log,
    read_change_feed,
    remove_domain_metadata,
    table_detail,
    write_delta_fallback,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )


def test_table_detail_summary(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 30), path, partition_by=["p"], row_tracking=True)
    write_delta_fallback(_df(spark, 30, 40), path, mode="append")
    d = table_detail(path)
    assert d["format"] == "parquet" and d["version"] == 1
    assert d["partitionColumns"] == ["p"]
    assert d["numFiles"] > 0 and d["sizeInBytes"] > 0
    assert d["properties"]["delta.enableRowTracking"] == "true"
    assert "rowTracking" in d["writerFeatures"] and d["minWriterVersion"] == 7
    assert d["lastModified"] >= d["createdAt"]


def test_remove_domain_metadata_tombstones(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 5), path)
    from polars_incremental_spark.sinks.deltalog import merge_into  # noqa: F401

    write_delta_fallback(
        _df(spark, 5, 8), path, mode="append",
        domain_metadata={"app.state": '{"x": 1}'},
    )
    log = DeltaLog(path)
    assert log.domain_metadata()["app.state"] == '{"x": 1}'
    remove_domain_metadata(path, "app.state")
    assert "app.state" not in DeltaLog(path).domain_metadata()
    with pytest.raises(KeyError):
        remove_domain_metadata(path, "app.state")
    # the tombstone survives checkpoint + expiry: the expired earlier
    # value must not resurrect from the checkpoint
    checkpoint_log(path)
    expire_log(path)
    assert "app.state" not in DeltaLog(path).domain_metadata()


def test_cdf_timestamp_bounds(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_fallback(_df(spark, 0, 5), path)
    enable_in_commit_timestamps(path)  # strictly monotone stamps
    write_delta_fallback(_df(spark, 5, 8), path, mode="append")
    write_delta_fallback(_df(spark, 8, 12), path, mode="append")
    log = DeltaLog(path)
    t2 = log.commit_timestamp_ms(2)
    t3 = log.commit_timestamp_ms(3)
    # starting at v2's stamp picks commits 2..head
    got = read_change_feed(spark, path, starting_timestamp_ms=t2)
    assert {r["_commit_version"] for r in got.collect()} == {2, 3}
    # bounded window [t2, t3) -> only commit 2
    got = read_change_feed(
        spark, path, starting_timestamp_ms=t2, ending_timestamp_ms=t3 - 1
    )
    assert {r["_commit_version"] for r in got.collect()} == {2}
    # a start past the head is a legal EMPTY window
    assert read_change_feed(
        spark, path, starting_timestamp_ms=t3 + 10_000
    ).count() == 0
    with pytest.raises(ValueError, match="not both"):
        read_change_feed(
            spark, path, starting_version=1, starting_timestamp_ms=t2
        )
