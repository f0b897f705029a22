"""DML <-> VACUUUM interplay: copy-on-write removes become vacuum-able
tombstones, DV'd files stay referenced (their rows live in the log, not
new files), and post-vacuum reads stay exact."""

from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.sinks.delta import delete_rows, read_table, write_table
from polars_incremental_spark.sinks.deltalog import (
    set_table_properties,
    vacuum_fallback,
)


def test_cow_delete_files_vacuum_away(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.range(100).select(F.col("id").alias("x")).repartitionByRange(4, "x"),
        path,
    )
    res = delete_rows(spark, path, "x >= 75")  # copy-on-write route
    assert res["files_rewritten"] >= 1
    removed = vacuum_fallback(path, retention_hours=0.0)
    # exactly the replaced file(s) reclaimed; snapshot reads still exact
    assert len(removed) >= 1
    assert read_table(spark, path).count() == 75
    log = DeltaLog(path)
    active = {a["path"] for a in log.snapshot_files(log.latest_version())}
    import os

    for rel in active:
        assert os.path.exists(log.abs_path(rel))


def test_dv_delete_survives_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark.range(100).select(F.col("id").alias("x")).coalesce(1), path)
    set_table_properties(path, {"delta.enableDeletionVectors": "true"})
    res = delete_rows(spark, path, "x >= 90")
    assert res["files_dv"] == 1
    removed = vacuum_fallback(path, retention_hours=0.0)
    # the DV'd file is STILL the active file — vacuum must not touch it
    assert removed == []
    assert read_table(spark, path).count() == 90
