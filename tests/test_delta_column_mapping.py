"""COLUMN MAPPING ('name' mode) on the jar-less Delta path.

PROTOCOL.md contract under test: after ``enable_column_mapping`` the
logical schema lives only in metaData.schemaString (per-field ids +
physicalName), parquet files / stats keys / partitionValues keys carry
PHYSICAL names, and RENAME / DROP COLUMN are metadata-only commits — no
data file is rewritten, time travel to pre-rename versions still shows
the old names, and every write/DML path round-trips through the
logical<->physical translation.

Reference behavior: delta-rs / delta-spark column mapping
(reference sinks/delta.py writes through delta-rs, which enforces the
same spec); this file proves the fallback writer honors it end-to-end.
"""

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog, PlanningError
from polars_incremental_spark.sinks.delta import (
    delete_rows,
    read_table,
    update_rows,
    write_table,
)
from polars_incremental_spark.sinks.deltalog import (
    CM_PHYS_KEY,
    drop_column,
    enable_column_mapping,
    read_delta_fallback,
    rename_column,
    set_table_properties,
    write_delta_fallback,
)


def _mk(spark, path, n=100):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    write_table(df, path)
    return df


def _field_meta(path):
    meta = DeltaLog(path).table_metadata()
    return {
        f["name"]: (f.get("metadata") or {})
        for f in json.loads(meta["schemaString"])["fields"]
    }


def test_enable_assigns_ids_and_physical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    v = enable_column_mapping(path)
    assert v == 1
    fm = _field_meta(path)
    # upgrade rule: physical = current logical, ids 1..n
    assert fm["k"][CM_PHYS_KEY] == "k" and fm["k"]["delta.columnMapping.id"] == 1
    assert fm["v"][CM_PHYS_KEY] == "v"
    log = DeltaLog(path)
    conf = log.table_metadata()["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"
    assert conf["delta.columnMapping.maxColumnId"] == "3"
    proto = log.protocol()
    assert proto["minReaderVersion"] >= 2 and proto["minWriterVersion"] >= 5
    # idempotent
    assert enable_column_mapping(path) == 1
    # pre-mapping data still reads
    assert read_table(spark, path).count() == 100


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    enable_column_mapping(path)
    files_before = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    rename_column(path, "v", "value")
    assert sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    ) == files_before  # no rewrite
    df = read_table(spark, path)
    assert "value" in df.columns and "v" not in df.columns
    assert df.agg(F.sum("value")).collect()[0][0] == sum(2 * i for i in range(100))
    # time travel to the pre-rename version shows the OLD logical name
    old = read_table(spark, path, version=1)
    assert "v" in old.columns and "value" not in old.columns
    # physical name unchanged under the new logical name
    fm = _field_meta(path)
    assert fm["value"][CM_PHYS_KEY] == "v"


def test_write_after_rename_stages_physical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10)
    enable_column_mapping(path)
    rename_column(path, "v", "value")
    more = spark.range(10, 20).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        (F.col("id") * 2).alias("value"),
    )
    write_table(more, path)
    assert read_table(spark, path).count() == 20
    # the newly staged file's parquet footer must use the PHYSICAL name
    log = DeltaLog(path)
    newest = max(
        log.snapshot_files(log.latest_version()),
        key=lambda a: a["modificationTime"],
    )
    names = pq.read_schema(os.path.join(path, newest["path"])).names
    assert "v" in names and "value" not in names
    # and its logged stats keys are physical too
    stats = json.loads(newest["stats"])
    assert "v" in stats["minValues"] and "value" not in stats["minValues"]


def test_new_column_gets_uuid_physical_name(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10)
    enable_column_mapping(path)
    evolved = spark.range(10, 15).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        (F.col("id") * 2).alias("v"),
        F.lit("x").alias("note"),
    )
    write_delta_fallback(evolved, path)
    fm = _field_meta(path)
    assert fm["note"][CM_PHYS_KEY].startswith("col-")
    assert fm["note"]["delta.columnMapping.id"] == 4
    conf = DeltaLog(path).table_metadata()["configuration"]
    assert conf["delta.columnMapping.maxColumnId"] == "4"
    out = read_table(spark, path)
    assert out.count() == 15
    # old files surface the new column as null
    assert out.filter(F.col("note").isNull()).count() == 10


def test_dml_on_mapped_renamed_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    enable_column_mapping(path)
    rename_column(path, "v", "value")
    delete_rows(spark, path, "value >= 180")  # ids 90..99
    assert read_table(spark, path).count() == 90
    update_rows(spark, path, "k = 0", {"value": "999"})
    got = read_table(spark, path).filter("k = 0").collect()
    assert got[0]["value"] == 999


def test_where_pruning_translates_to_physical_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartitionByRange(4, "k")
    write_table(df, path)
    enable_column_mapping(path)
    rename_column(path, "v", "value")
    # corrupt every file whose stats exclude value >= 190 (k >= 95):
    # pruning must keep them unopened even though the predicate uses the
    # NEW logical name against physical stats keys
    log = DeltaLog(path)
    kept = 0
    for a in log.snapshot_files(log.latest_version()):
        stats = json.loads(a["stats"])
        if stats["maxValues"]["v"] < 190:
            with open(os.path.join(path, a["path"]), "wb") as fh:
                fh.write(b"corrupt")
        else:
            kept += 1
    assert kept == 1
    out = read_delta_fallback(spark, path, where="value >= 190")
    assert sorted(r["k"] for r in out.collect()) == [95, 96, 97, 98, 99]


def test_partition_column_rename_keeps_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("g")
    )
    write_table(df, path, partition_by=["g"])
    enable_column_mapping(path)
    rename_column(path, "g", "grp")
    meta = DeltaLog(path).table_metadata()
    assert meta["partitionColumns"] == ["grp"]
    # corrupt non-matching partitions: partitionValues keys stay physical
    for a in DeltaLog(path).snapshot_files(DeltaLog(path).latest_version()):
        if a["partitionValues"].get("g") != "2":
            with open(os.path.join(path, a["path"]), "wb") as fh:
                fh.write(b"corrupt")
    out = read_delta_fallback(spark, path, where="grp = 2")
    assert out.count() == 10
    assert set(out.columns) == {"k", "grp"}
    # appends after the rename land in the same physical dirs
    more = spark.range(100, 104).select(
        F.col("id").alias("k"), F.lit(2).cast("int").alias("grp")
    )
    write_table(more, path)
    assert read_delta_fallback(spark, path, where="grp = 2").count() == 14


def test_drop_column_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=20)
    enable_column_mapping(path)
    files_before = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    v_drop = drop_column(path, "v")
    assert sorted(f for f in os.listdir(path) if f.endswith(".parquet")) == files_before
    df = read_table(spark, path)
    assert set(df.columns) == {"k", "g"} and df.count() == 20
    # pre-drop time travel still sees the column
    old = read_table(spark, path, version=v_drop - 1)
    assert "v" in old.columns


def test_rename_and_drop_refusals(spark, tmp_path):
    from polars_incremental_spark.sinks.deltalog import add_check_constraint

    path = str(tmp_path / "t")
    _mk(spark, path)
    # both require mapping
    with pytest.raises(ValueError, match="requires column mapping"):
        rename_column(path, "v", "value")
    with pytest.raises(ValueError, match="requires column mapping"):
        drop_column(path, "v")
    enable_column_mapping(path)
    add_check_constraint(spark, path, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        rename_column(path, "v", "value")
    with pytest.raises(ValueError, match="CHECK constraint"):
        drop_column(path, "v")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(path, "k", "g")
    with pytest.raises(ValueError, match="no such column"):
        rename_column(path, "zz", "value")
    with pytest.raises(ValueError, match="partition column"):
        # set up a partitioned mapped table inline
        p2 = str(tmp_path / "p2")
        write_table(
            spark.range(4).select(
                F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("g")
            ),
            p2,
            partition_by=["g"],
        )
        enable_column_mapping(p2)
        drop_column(p2, "g")


def test_mapping_gates(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    # raw-props route is intercepted
    with pytest.raises(ValueError, match="enable_column_mapping"):
        set_table_properties(path, {"delta.columnMapping.mode": "name"})
    # id mode fails closed everywhere
    p3 = str(tmp_path / "t3")
    _mk(spark, p3)
    meta = DeltaLog(p3).table_metadata()
    conf = dict(meta.get("configuration") or {})
    conf["delta.columnMapping.mode"] = "id"
    from polars_incremental_spark.sinks.deltalog import _write_commit

    _write_commit(
        os.path.join(p3, "_delta_log"),
        1,
        [{"metaData": {**meta, "configuration": conf}}],
    )
    with pytest.raises(PlanningError, match="only 'name'"):
        read_delta_fallback(spark, p3)


def test_cdf_on_mapped_table_roundtrip(spark, tmp_path):
    """CDF + column mapping compose: cdc parquet stages under PHYSICAL
    names, and the streaming CDF reader renames back to the logical names
    CURRENT at read time — a DML after a rename streams changes under the
    new name."""
    import pyarrow.parquet as _pq

    from polars_incremental_spark.pipeline import Pipeline
    from polars_incremental_spark.sources.base import DeltaSource

    path = str(tmp_path / "t")
    _mk(spark, path, n=10)
    enable_column_mapping(path)
    set_table_properties(path, {"delta.enableChangeDataFeed": "true"})
    rename_column(path, "v", "value")

    batches = []
    p = Pipeline(
        source=DeltaSource(path, read_change_feed=True),
        checkpoint_dir=str(tmp_path / "ck"),
        writer=lambda df: batches.append(
            sorted(
                (r["k"], r["value"], r["_change_type"]) for r in df.collect()
            )
        ),
    )
    p.run(spark)  # initial snapshot: 10 rows as inserts, logical names
    assert sorted(r[0] for r in batches[0]) == list(range(10))
    assert all(r[2] == "insert" and r[1] == 2 * r[0] for r in batches[0])

    delete_rows(spark, path, "value >= 16", write_cdf=True)  # k in {8, 9}
    # the staged cdc parquet itself carries the PHYSICAL name
    cdc_dir = os.path.join(path, "_change_data")
    cdc_files = [f for f in os.listdir(cdc_dir) if f.endswith(".parquet")]
    assert cdc_files
    names = _pq.read_schema(os.path.join(cdc_dir, cdc_files[0])).names
    assert "v" in names and "value" not in names and "_change_type" in names

    p.run(spark)  # CDF tail: precise deletes under the CURRENT logical name
    deletes = [r for b in batches[1:] for r in b if r[2] == "delete"]
    assert sorted(r[0] for r in deletes) == [8, 9]
    assert all(r[1] == 2 * r[0] for r in deletes)  # logical 'value' intact


def test_streaming_tailer_raw_gate_and_pipeline_reads(spark, tmp_path):
    """check_reader_supported still fails closed by DEFAULT (raw-file
    callers that don't translate names), but the planned streaming source
    translates: a pipeline streams a mapped table under logical names,
    and a mid-stream rename surfaces the new name from the next batch on
    (delta-spark's schema-tracking contract)."""
    from polars_incremental_spark.pipeline import Pipeline
    from polars_incremental_spark.sources.base import DeltaSource

    path = str(tmp_path / "t")
    _mk(spark, path, n=10)
    enable_column_mapping(path)
    log = DeltaLog(path)
    with pytest.raises(PlanningError, match="column mapping"):
        log.check_reader_supported()  # default stays fail-closed

    seen: list[tuple[list[str], int]] = []

    def writer(df):
        seen.append((sorted(df.columns), df.count()))

    ck = str(tmp_path / "ck")
    p = Pipeline(source=DeltaSource(path), checkpoint_dir=ck, writer=writer)
    p.run(spark)
    assert seen == [(["g", "k", "v"], 10)]
    rename_column(path, "v", "value")
    more = spark.range(10, 14).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        (F.col("id") * 2).alias("value"),
    )
    write_table(more, path)
    p.run(spark)
    assert seen[-1] == (["g", "k", "value"], 4)
    # CDF-mode streaming of a mapped table also works (see
    # test_cdf_on_mapped_table_roundtrip for the precise change-set check)
    pc = Pipeline(
        source=DeltaSource(path, read_change_feed=True),
        checkpoint_dir=str(tmp_path / "ck2"),
        writer=writer,
    )
    pc.run(spark)
    assert seen[-1][1] == 14  # snapshot as inserts, current logical names


def test_overwrite_and_compact_on_mapped_table(spark, tmp_path):
    from polars_incremental_spark.sinks.deltalog import compact_fallback

    path = str(tmp_path / "t")
    _mk(spark, path, n=50)
    enable_column_mapping(path)
    rename_column(path, "v", "value")
    replacement = spark.range(7).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        (F.col("id") * 3).alias("value"),
    )
    write_delta_fallback(replacement, path, mode="overwrite")
    assert read_table(spark, path).count() == 7
    compact_fallback(spark, path, target_partitions=1)
    df = read_table(spark, path)
    assert df.count() == 7
    assert df.agg(F.sum("value")).collect()[0][0] == sum(3 * i for i in range(7))


# -------------------------------------------------- type widening (merge)
def test_type_widening_on_append(spark, tmp_path):
    """An append carrying a WIDER primitive widens the logged schema; old
    (narrower) files upcast at read — Delta typeWidening semantics on the
    mergeSchema path."""
    path = str(tmp_path / "t")
    write_table(
        spark.range(5).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("float").alias("v"),
        ),
        path,
    )
    write_delta_fallback(
        spark.range(5, 8).select(
            F.col("id").cast("long").alias("k"),
            F.col("id").cast("double").alias("v"),
        ),
        path,
    )
    df = read_table(spark, path)
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}
    assert df.count() == 8
    assert df.agg(F.sum("k")).collect()[0][0] == sum(range(8))


def test_narrower_append_keeps_wide_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark.range(3).select(F.col("id").alias("k")), path)  # long
    write_delta_fallback(
        spark.range(3, 6).select(F.col("id").cast("int").alias("k")), path
    )
    df = read_table(spark, path)
    assert dict(df.dtypes) == {"k": "bigint"} and df.count() == 6


def test_incompatible_type_change_is_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark.range(3).select(F.col("id").alias("k")), path)
    before = DeltaLog(path).latest_version()
    with pytest.raises(ValueError, match="incompatible type change"):
        write_delta_fallback(
            spark.range(3).select(F.col("id").cast("string").alias("k")), path
        )
    assert DeltaLog(path).latest_version() == before  # nothing staged/committed


def test_widening_composes_with_column_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.range(4).select(
            F.col("id").alias("k"), F.col("id").cast("int").alias("v")
        ),
        path,
    )
    enable_column_mapping(path)
    rename_column(path, "v", "val")
    write_delta_fallback(
        spark.range(4, 6).select(
            F.col("id").alias("k"), F.col("id").cast("long").alias("val")
        ),
        path,
    )
    df = read_table(spark, path)
    assert dict(df.dtypes) == {"k": "bigint", "val": "bigint"}
    assert df.count() == 6
    # the widen kept the mapping metadata (physical name still 'v')
    assert _field_meta(path)["val"][CM_PHYS_KEY] == "v"
