"""Streaming tests: applyInPandasWithState operators with cross-run state
recovery through the checkpointed state store."""

from __future__ import annotations

import pytest

from polars_incremental_spark.streaming.stateful import running_totals, seen_key_filter


def _run_stream(spark, src_dir, ckpt, op):
    """One availableNow pass; returns the rows emitted this run.

    foreachBatch (not the memory sink) because it supports checkpoint
    RECOVERY — the whole point of these tests is state surviving runs.
    """
    rows = []
    stream = (
        spark.readStream.schema("k string, v double")
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    query = (
        op(stream)
        .writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return rows


def test_running_totals_across_runs(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"]
    ).write.parquet(src + "/b1.parquet")

    r1 = _run_stream(spark, src, ckpt, lambda s: running_totals(s, ["k"], "v"))
    out1 = {r["k"]: (r["n"], r["total"]) for r in r1}
    assert out1 == {"a": (2, 3.0), "b": (1, 5.0)}

    # second run, new data: state store carries the totals forward
    spark.createDataFrame([("a", 10.0), ("c", 1.0)], ["k", "v"]).write.parquet(
        src + "/b2.parquet"
    )
    r2 = _run_stream(spark, src, ckpt, lambda s: running_totals(s, ["k"], "v"))
    out2 = {r["k"]: (r["n"], r["total"]) for r in r2}
    assert out2["a"] == (3, 13.0)  # 2+1 events, 3.0+10.0
    assert out2["c"] == (1, 1.0)
    assert "b" not in out2  # no new data for b → no update emitted


def test_seen_key_filter_exactly_once_per_key(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"]
    ).write.parquet(src + "/b1.parquet")
    r1 = _run_stream(spark, src, ckpt, lambda s: seen_key_filter(s, ["k"]))
    assert {r["k"] for r in r1} == {"a", "b"}

    spark.createDataFrame([("a", 9.0), ("d", 3.0)], ["k", "v"]).write.parquet(
        src + "/b2.parquet"
    )
    r2 = _run_stream(spark, src, ckpt, lambda s: seen_key_filter(s, ["k"]))
    assert {r["k"] for r in r2} == {"d"}  # 'a' already seen in run 1 → suppressed


# ------------------------------------------- transformWithStateInPandas


def test_tws_gate_reports_capability(spark):
    """TWS needs protobuf on the Python workers; in this sandbox it is
    absent, so the gate must refuse with a pointer at the tested
    applyInPandasWithState twins instead of crashing mid-stream."""
    from polars_incremental_spark.errors import UnsupportedFormatError
    from polars_incremental_spark.streaming import tws

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    if tws.tws_available():
        pytest.skip("protobuf present: gate open, e2e test covers it")
    with pytest.raises(UnsupportedFormatError, match="protobuf"):
        tws.running_totals_tws(df, ["k"], "v")
    with pytest.raises(UnsupportedFormatError, match="protobuf"):
        tws.seen_key_filter_tws(df, ["k"])


@pytest.mark.skipif(
    "not __import__('polars_incremental_spark.streaming.tws', fromlist=['tws_available']).tws_available()",
    reason="transformWithState protobuf dependency absent",
)
def test_tws_running_totals_across_runs(spark, tmp_path):
    """Same contract as test_running_totals_across_runs, on the new API
    (runs wherever protobuf + RocksDB state store are available)."""
    from polars_incremental_spark.streaming.tws import running_totals_tws

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"]
    ).write.parquet(src + "/b1.parquet")
    r1 = _run_stream(spark, src, ckpt, lambda s: running_totals_tws(s, ["k"], "v"))
    assert {r["k"]: (r["n"], r["total"]) for r in r1} == {
        "a": (2, 3.0),
        "b": (1, 5.0),
    }
    spark.createDataFrame([("a", 10.0)], ["k", "v"]).write.parquet(
        src + "/b2.parquet"
    )
    r2 = _run_stream(spark, src, ckpt, lambda s: running_totals_tws(s, ["k"], "v"))
    assert {r["k"]: (r["n"], r["total"]) for r in r2} == {"a": (3, 13.0)}
