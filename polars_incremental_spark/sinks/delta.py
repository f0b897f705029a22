"""Delta (or parquet-fallback) table sinks + CDC table apply.

Parity: ``write_delta`` / ``apply_cdc_delta``
(reference: src/polars_incremental/sinks/delta.py:10-158).  When delta-spark
is on the classpath, ``apply_cdc_table`` uses a real ``DeltaTable.merge`` —
a strict upgrade over the reference's read-all/overwrite merge (its docs
call that path "best for small/medium tables"; MERGE scales because only
touched files rewrite).  Without delta-spark (this container), the same API
runs against parquet directories with an atomic-overwrite merge so the CDC
semantics stay testable.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc import (
    CHANGE_TYPE_COL,
    apply_cdc,
    dedupe_changes,
    normalize_change_types,
    prepare_changes,
    strip_cdc_columns,
)
from ..errors import UnsupportedFormatError
from ..sources.delta import delta_available


def write_table(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    merge_schema: bool = False,
    file_format: str | None = None,
    partition_by: list[str] | None = None,
    generated_columns: dict[str, str] | None = None,
    identity_columns: dict[str, dict] | None = None,
    row_tracking: bool = False,
    user_metadata: str | None = None,
    domain_metadata: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame as a Delta table — native delta-spark when the jar
    is present, else the spec-compliant fallback log writer.  Pass
    ``file_format="parquet"`` for a plain (log-less) parquet directory.

    The table-feature kwargs (generated/identity columns, row tracking,
    userMetadata, caller domain metadata) run on the jar-less path; with
    the jar present they raise rather than silently dropping — the native
    writer configures these via DDL/options instead."""
    fmt = file_format or "delta"
    feature_kwargs = (
        generated_columns
        or identity_columns
        or row_tracking
        or user_metadata
        or domain_metadata
    )
    if fmt != "delta" and feature_kwargs:
        raise ValueError(
            "generated_columns/identity_columns/row_tracking/user_metadata/"
            "domain_metadata require a Delta (log-backed) table; a plain "
            f"{fmt} directory has no transaction log to carry them"
        )
    if fmt == "delta" and not delta_available():
        from .deltalog import write_delta_fallback

        write_delta_fallback(
            df,
            path,
            mode=mode,
            partition_by=partition_by,
            generated_columns=generated_columns,
            identity_columns=identity_columns,
            row_tracking=row_tracking,
            user_metadata=user_metadata,
            domain_metadata=domain_metadata,
        )
        return
    if feature_kwargs:
        raise ValueError(
            "generated_columns/identity_columns/row_tracking/user_metadata/"
            "domain_metadata are fallback-writer options; with delta-spark "
            "present configure them via Delta DDL/session options instead"
        )
    writer = df.write.format(fmt).mode(mode)
    if merge_schema:
        writer = writer.option("mergeSchema", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    file_format: str | None = None,
    *,
    version: int | None = None,
    timestamp_ms: int | None = None,
    where: str | None = None,
    row_ids: bool = False,
) -> DataFrame:
    """Snapshot read with optional TIME TRAVEL: ``version`` pins the read
    AS OF that commit; ``timestamp_ms`` resolves to the last commit at or
    before it.  Native delta-spark uses versionAsOf/timestampAsOf; the
    jar-less fallback replays the log to the same snapshot (expired
    versions raise, matching the jar's contract).

    ``where`` applies a predicate WITH data skipping: the jar-less path
    prunes files from the logged ``add.stats`` min/max + partitionValues
    before opening any of them (deltalog.read_delta_fallback); the native
    and plain-parquet paths get the same effect from the engine's own
    stats/partition pruning once the filter is in the plan.

    Reference parity: deltalake's ``DeltaTable(path, version=...)`` /
    ``load_as_version`` (reference reads pinned snapshots the same way).
    """
    fmt = file_format or ("delta" if os.path.isdir(os.path.join(path, "_delta_log")) else "parquet")
    if fmt != "delta" and (version is not None or timestamp_ms is not None):
        raise UnsupportedFormatError("time travel requires a Delta table")
    if fmt != "delta" and row_ids:
        raise UnsupportedFormatError(
            "row_ids=True requires a row-tracked Delta table; a plain "
            f"{fmt} directory carries no baseRowId metadata"
        )
    if fmt == "delta" and not delta_available():
        from .deltalog import read_delta_fallback

        return read_delta_fallback(
            spark,
            path,
            version=version,
            timestamp_ms=timestamp_ms,
            where=where,
            row_ids=row_ids,
        )
    if row_ids:
        raise ValueError(
            "row_ids=True is a fallback-reader option; with delta-spark "
            "present read _metadata.row_id via the native reader instead"
        )
    reader = spark.read.format(fmt)
    if version is not None:
        reader = reader.option("versionAsOf", version)
    if timestamp_ms is not None:
        import datetime as _dt

        ts = _dt.datetime.fromtimestamp(timestamp_ms / 1000, _dt.timezone.utc)
        reader = reader.option("timestampAsOf", ts.strftime("%Y-%m-%d %H:%M:%S.%f"))
    df = reader.load(path)
    return df.filter(where) if where else df


def _overwrite_atomic(df: DataFrame, path: str) -> None:
    """Parquet-fallback overwrite: stage next to the target, then swap.

    The read feeding ``df`` comes from ``path`` itself, so a direct
    ``mode("overwrite")`` would truncate its own input; staging avoids that.
    """
    staging = path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df.write.mode("overwrite").parquet(staging)
    backup = path + ".old"
    if os.path.exists(path):
        shutil.move(path, backup)
    os.replace(staging, path)
    shutil.rmtree(backup, ignore_errors=True)


def apply_cdc_table(
    spark: SparkSession,
    changes: DataFrame,
    target_path: str,
    *,
    keys: list[str],
    mode: str = "merge",
    change_type_col: str = CHANGE_TYPE_COL,
    change_type_map: Mapping[str, str] | None = None,
    ignore_delete: bool = False,
    dedupe_by_latest_commit: bool = True,
    compute_counts: bool = True,
    write_change_feed: bool = False,
) -> dict[str, Any]:
    """Apply CDC changes to a stored table; returns {rows_in, rows_out, action}.

    ``compute_counts=False`` skips the rows_in / rows_out count jobs — at
    scale those are two full extra scans per merge; the counts come back as
    None and the empty-changes noop short-circuit is skipped.

    ``write_change_feed=True`` (fallback writer only) also records the
    applied changes as Delta change-data files, so downstream
    ``DeltaSource(read_change_feed=True)`` consumers stream the precise
    deltas instead of erroring on the merge's file rewrite.  With
    delta-spark present, enable ``delta.enableChangeDataFeed`` on the table
    instead — the native MERGE writes CDF itself.
    """
    rows_in = changes.count() if compute_counts else None
    if rows_in == 0:
        return {"rows_in": 0, "rows_out": 0, "action": "noop"}

    exists = os.path.exists(target_path)
    use_delta = delta_available() and (
        not exists or os.path.isdir(os.path.join(target_path, "_delta_log"))
    )

    if mode == "append_only":
        prepared = prepare_changes(
            normalize_change_types(changes, change_type_map, change_type_col),
            mode="append_only",
            change_type_col=change_type_col,
        )
        if dedupe_by_latest_commit:
            prepared = dedupe_changes(prepared, keys, change_type_col=change_type_col)
        payload = strip_cdc_columns(prepared)
        write_table(payload, target_path, mode="append" if exists else "overwrite")
        rows_out = payload.count() if compute_counts else None
        return {"rows_in": rows_in, "rows_out": rows_out, "action": "append"}

    if mode != "merge":
        raise ValueError(f"unknown mode {mode!r}")

    if use_delta and exists:
        return _merge_delta(
            spark,
            changes,
            target_path,
            keys=keys,
            change_type_col=change_type_col,
            change_type_map=change_type_map,
            ignore_delete=ignore_delete,
            dedupe_by_latest_commit=dedupe_by_latest_commit,
            rows_in=rows_in,
            compute_counts=compute_counts,
        )

    existing = read_table(spark, target_path) if exists else None
    merged = apply_cdc(
        changes,
        existing,
        keys=keys,
        change_type_col=change_type_col,
        change_type_map=change_type_map,
        mode="merge",
        ignore_delete=ignore_delete,
        dedupe_by_latest_commit=dedupe_by_latest_commit,
    )
    is_delta_table = os.path.isdir(os.path.join(target_path, "_delta_log"))
    if use_delta or is_delta_table or not exists:
        # native delta, fallback-log delta, or fresh table → write_table
        # routes appropriately; the fallback overwrite is log-atomic and
        # never truncates its own input (old files stay until vacuum)
        if write_change_feed and not use_delta:
            from .deltalog import write_delta_fallback

            cdc_rows = prepare_changes(
                normalize_change_types(changes, change_type_map, change_type_col),
                mode="merge",
                ignore_delete=ignore_delete,
                change_type_col=change_type_col,
            )
            if dedupe_by_latest_commit:
                cdc_rows = dedupe_changes(cdc_rows, keys, change_type_col=change_type_col)
            # CDF files carry the payload + _change_type; commit version and
            # timestamp are injected by the reader from the log entry
            cdc_payload = cdc_rows.drop(
                *[
                    c
                    for c in ("_commit_version", "_commit_timestamp", "__cdc_row_order")
                    if c in cdc_rows.columns
                ]
            )
            write_delta_fallback(
                merged, target_path, mode="overwrite", cdc_df=cdc_payload
            )
        else:
            write_table(merged, target_path, mode="overwrite")
    else:
        # plain parquet directory (no log): staged atomic swap
        _overwrite_atomic(merged, target_path)
    rows_out = read_table(spark, target_path).count() if compute_counts else None
    return {"rows_in": rows_in, "rows_out": rows_out, "action": "merge"}


def _merge_delta(
    spark: SparkSession,
    changes: DataFrame,
    target_path: str,
    *,
    keys: list[str],
    change_type_col: str,
    change_type_map: Mapping[str, str] | None,
    ignore_delete: bool,
    dedupe_by_latest_commit: bool,
    rows_in: int | None,
    compute_counts: bool = True,
) -> dict[str, Any]:
    """Real Delta MERGE: whenMatchedDelete / UpdateAll / InsertAll."""
    from delta.tables import DeltaTable

    prepared = prepare_changes(
        normalize_change_types(changes, change_type_map, change_type_col),
        mode="merge",
        ignore_delete=ignore_delete,
        change_type_col=change_type_col,
    )
    if dedupe_by_latest_commit:
        prepared = dedupe_changes(prepared, keys, change_type_col=change_type_col)

    target = DeltaTable.forPath(spark, target_path)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    payload_cols = [c for c in prepared.columns if c not in (change_type_col,)]
    source = prepared.select(
        *[F.col(c) for c in payload_cols], F.col(change_type_col).alias("__ct")
    )
    (
        target.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedDelete(condition="s.__ct = 'delete'")
        .whenMatchedUpdate(
            condition="s.__ct != 'delete'",
            set={c: f"s.`{c}`" for c in payload_cols if not c.startswith("_commit")},
        )
        .whenNotMatchedInsert(
            condition="s.__ct != 'delete'",
            values={c: f"s.`{c}`" for c in payload_cols if not c.startswith("_commit")},
        )
        .execute()
    )
    rows_out = (
        spark.read.format("delta").load(target_path).count() if compute_counts else None
    )
    return {"rows_in": rows_in, "rows_out": rows_out, "action": "merge"}


def table_history(path: str) -> list[dict]:
    """DESCRIBE HISTORY: commit list (newest first) with operation and file
    counts.  Log-based — reads any spec-compliant Delta log regardless of
    which engine wrote it, jar or no jar.

    Reference parity: deltalake ``DeltaTable.history()``.
    """
    from .deltalog import table_history as _hist

    return _hist(path)


def restore_table(path: str, *, version: int) -> dict:
    """RESTORE TABLE ... TO VERSION AS OF: flips the active file set back to
    ``version`` in a NEW commit (history preserved; vacuumed target files
    raise).  Log-based single-writer implementation — deployments with the
    delta-spark jar and concurrent writers should use native
    ``RESTORE TABLE`` SQL instead (this writer has no conflict detection).

    Reference parity: deltalake ``DeltaTable.restore()``.
    """
    from .deltalog import restore_table_fallback

    return restore_table_fallback(path, version=version)


def delete_rows(
    spark: SparkSession,
    path: str,
    where: str,
    *,
    write_cdf: bool = False,
    dv_max_rows_per_file: int | None = None,
) -> dict:
    """DELETE FROM <table> WHERE ... — native DeltaTable.delete when the
    jar is present, else the jar-less copy-on-write implementation with
    stats-pruned candidate files (deltalog.delete_where)."""
    if delta_available():
        from delta.tables import DeltaTable  # pragma: no cover (no jar here)

        DeltaTable.forPath(spark, path).delete(where)
        return {"native": True}
    from .deltalog import delete_where as _delete

    return _delete(
        spark, path, where, write_cdf=write_cdf,
        dv_max_rows_per_file=dv_max_rows_per_file,
    )


def update_rows(
    spark: SparkSession,
    path: str,
    where: str,
    set_exprs: dict,
    *,
    write_cdf: bool = False,
) -> dict:
    """UPDATE <table> SET ... WHERE ... — native DeltaTable.update when the
    jar is present, else the jar-less copy-on-write implementation
    (deltalog.update_where)."""
    if delta_available():
        from delta.tables import DeltaTable  # pragma: no cover (no jar here)

        DeltaTable.forPath(spark, path).update(where, set_exprs)
        return {"native": True}
    from .deltalog import update_where as _update

    return _update(spark, path, where, set_exprs, write_cdf=write_cdf)


def enable_column_mapping_table(spark: SparkSession, path: str) -> dict:
    """Enable column mapping ('name' mode) — native TBLPROPERTIES DDL when
    the jar is present, else the jar-less metadata commit
    (deltalog.enable_column_mapping): per-field ids + physical names,
    protocol reader v2 / writer v5, renames/drops become metadata-only."""
    if delta_available():  # pragma: no cover (no jar here)
        spark.sql(
            f"ALTER TABLE delta.`{path}` SET TBLPROPERTIES ("
            "'delta.columnMapping.mode' = 'name', "
            "'delta.minReaderVersion' = '2', 'delta.minWriterVersion' = '5')"
        )
        return {"native": True}
    from .deltalog import enable_column_mapping as _enable

    return {"native": False, "version": _enable(path)}


def rename_table_column(spark: SparkSession, path: str, old: str, new: str) -> dict:
    """ALTER TABLE ... RENAME COLUMN — metadata-only on column-mapped
    tables (deltalog.rename_column); native DDL when the jar is present."""
    if delta_available():  # pragma: no cover (no jar here)
        spark.sql(f"ALTER TABLE delta.`{path}` RENAME COLUMN `{old}` TO `{new}`")
        return {"native": True}
    from .deltalog import rename_column as _rename

    return {"native": False, "version": _rename(path, old, new)}


def drop_table_column(spark: SparkSession, path: str, name: str) -> dict:
    """ALTER TABLE ... DROP COLUMN — metadata-only on column-mapped tables
    (deltalog.drop_column); native DDL when the jar is present."""
    if delta_available():  # pragma: no cover (no jar here)
        spark.sql(f"ALTER TABLE delta.`{path}` DROP COLUMN `{name}`")
        return {"native": True}
    from .deltalog import drop_column as _drop

    return {"native": False, "version": _drop(path, name)}
