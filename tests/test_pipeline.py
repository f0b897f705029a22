"""Pipeline semantics (reference tests/test_pipeline.py analog): end-to-end
micro-batching, no-commit-on-sink-failure, retry reuses offset, context
kwarg injection, observer events, idempotent batch outputs."""

import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark import (
    BaseObserver,
    FilesSource,
    Pipeline,
    WriterError,
    write_parquet_batch,
)


def _write_events_slice(spark, sf_dir, out_dir, lo, hi, name):
    df = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        (F.col("event_id") >= lo) & (F.col("event_id") < hi)
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/{name}")


@pytest.fixture()
def source_dir(spark, sf_dir, tmp_path):
    d = str(tmp_path / "src")
    _write_events_slice(spark, sf_dir, d, 0, 500, "part0")
    return d


def test_end_to_end_and_no_reprocessing(spark, source_dir, tmp_path):
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    seen_batches = []

    def transform(df):
        return df.groupBy("event_type").agg(F.count("*").alias("n"))

    def writer(df, batch_id):
        seen_batches.append(batch_id)
        write_parquet_batch(df, out, batch_id)
        return {"rows": df.count()}

    pipe = Pipeline(
        source=FilesSource(path=source_dir),
        checkpoint_dir=cp,
        transform=transform,
        writer=writer,
    )
    result = pipe.run(spark)
    assert result.batches == 1
    assert seen_batches == [0]
    assert os.path.isdir(f"{out}/batch_0")

    # rerun: nothing new -> zero batches (no reprocessing)
    assert pipe.run(spark).batches == 0

    df2 = spark.read.parquet(f"{out}/batch_0")
    assert df2.count() > 0
    assert set(df2.columns) == {"event_type", "n"}


def test_sink_failure_leaves_batch_pending_then_retry(spark, source_dir, tmp_path):
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    attempts = []

    def failing_writer(df, batch_id):
        attempts.append(batch_id)
        raise RuntimeError("sink down")

    pipe = Pipeline(source=FilesSource(path=source_dir), checkpoint_dir=cp, writer=failing_writer)
    with pytest.raises(WriterError):
        pipe.run(spark)
    assert attempts == [0]

    # retry with a working writer: same batch id, same file set
    files_seen = []

    def ok_writer(df, batch_id, files):
        files_seen.append((batch_id, tuple(sorted(files))))
        write_parquet_batch(df, out, batch_id)

    pipe2 = Pipeline(source=FilesSource(path=source_dir), checkpoint_dir=cp, writer=ok_writer)
    assert pipe2.run(spark).batches == 1
    assert files_seen[0][0] == 0


def test_context_injection_matrix(spark, source_dir, tmp_path):
    cp = str(tmp_path / "cp")
    captured = {}

    def writer(df, batch_id, files, state, batch):
        captured["batch_id"] = batch_id
        captured["n_files"] = len(files)
        captured["state"] = state
        captured["batch"] = batch
        state.save_json("wm", 42)

    pipe = Pipeline(source=FilesSource(path=source_dir), checkpoint_dir=cp, writer=writer)
    pipe.run(spark)
    assert captured["batch_id"] == 0
    assert captured["n_files"] == 1 or captured["n_files"] > 0
    assert captured["state"].load_json("wm") == 42
    assert captured["batch"].batch_id == 0


def test_observer_events(spark, source_dir, tmp_path):
    events = []

    class Obs(BaseObserver):
        def on_stage_end(self, stage, batch_id, duration_s):
            events.append(("end", stage))

        def on_batch_planned(self, batch_id, n_files):
            events.append(("planned", batch_id))

        def on_batch_committed(self, batch_id, metadata):
            events.append(("committed", batch_id))

    pipe = Pipeline(
        source=FilesSource(path=source_dir),
        checkpoint_dir=str(tmp_path / "cp"),
        writer=lambda df: None,
        observer=Obs(),
    )
    pipe.run(spark)
    stages = [s for kind, s in events if kind == "end"]
    # trailing "plan" = the idle check that ends the drain loop
    assert stages[:4] == ["plan", "read", "write", "commit"]
    assert ("planned", 0) in events and ("committed", 0) in events


def test_max_batches_and_caps(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    for i in range(3):
        _write_events_slice(spark, sf_dir, src, i * 100, (i + 1) * 100, f"part{i}")
    counted = []
    pipe = Pipeline(
        source=FilesSource(path=src, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "cp"),
        writer=lambda df, batch_id: counted.append(batch_id),
    )
    assert pipe.run(spark, max_batches=2).batches == 2
    assert pipe.run(spark).batches == 1  # drains the remainder
    assert counted == [0, 1, 2]


def test_observed_write_captures_metrics_single_pass(spark, source_dir, tmp_path):
    """Observation metrics ride the write execution itself — the captured
    row count / sum equal the written data with no post-write count()."""
    from polars_incremental_spark.sinks.parquet import write_parquet_batch_observed

    df = spark.read.parquet(f"{source_dir}/part0")
    path, metrics = write_parquet_batch_observed(df, str(tmp_path / "out"), 0)
    written = spark.read.parquet(path)
    assert metrics["rows"] == written.count() > 0

    path2, metrics2 = write_parquet_batch_observed(
        df,
        str(tmp_path / "out2"),
        0,
        metrics=[
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
            F.sum(F.col("value").isNull().cast("int")).alias("null_values"),
        ],
    )
    agg = written.agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
    ).collect()[0][0]
    assert metrics2["rows"] == metrics["rows"]
    assert metrics2["total"] == pytest.approx(agg)
    assert metrics2["null_values"] == 0
