"""Jar-less Delta lakehouse tour: every table-format feature in one flow.

A curated-documents table goes through its production lifecycle —
generated partition column, CHECK constraint, data-skipping reads,
MERGE upserts, deletion-vector retractions, OPTIMIZE ZORDER, time
travel, history, stats backfill, vacuum — all against the spec-shaped
transaction log, no delta-spark jar required.

Run: python examples/delta_lakehouse.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark import get_spark
from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.errors import ConstraintViolationError
from polars_incremental_spark.sinks.delta import (
    delete_rows,
    read_table,
    table_history,
)
from polars_incremental_spark.sinks.deltalog import (
    add_check_constraint,
    compact_fallback,
    merge_into,
    set_table_properties,
    vacuum_fallback,
    write_delta_fallback,
)
from polars_incremental_spark.tables import load_table


def main() -> None:
    spark = get_spark("delta-lakehouse")
    work = tempfile.mkdtemp(prefix="pis_lake_")
    table = os.path.join(work, "docs")

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "lang", "source", "n_chars",
        F.to_timestamp(F.lit("2024-03-15 12:00:00")).alias("ingested_at"),
    )

    # 1. create with a GENERATED partition column (derived date) — writers
    #    never supply it; readers partition-prune on it
    write_delta_fallback(
        docs.limit(300),
        table,
        generated_columns={"ingest_date": "CAST(ingested_at AS DATE)"},
        partition_by=["ingest_date"],
    )
    print("created:", read_table(spark, table).count(), "rows")

    # 2. governance: CHECK constraint + table properties
    add_check_constraint(spark, table, "chars_positive", "n_chars > 0")
    set_table_properties(table, {"delta.enableDeletionVectors": "true"})
    try:
        write_delta_fallback(
            spark.createDataFrame(
                [(9999, "en", "src0", -1, None)],
                "doc_id long, lang string, source string, n_chars long, "
                "ingested_at timestamp",
            ),
            table,
            mode="append",
        )
    except ConstraintViolationError:
        print("constraint rejected a bad append")

    # 3. data skipping: files the stats disprove are never opened
    small = read_table(spark, table, where="n_chars < 200")
    print("skipping read:", small.count(), "short docs")

    # 4. MERGE: re-crawl updates lang tags, inserts new docs
    recrawl = docs.filter(F.col("doc_id").between(250, 350)).withColumn(
        "lang", F.lit("recrawled")
    )
    res = merge_into(
        spark, table, recrawl, keys=["doc_id"],
        when_matched_update={"lang": "src.lang"},
    )
    print(
        f"merge: updated {res['rows_updated']}, inserted {res['rows_inserted']}"
    )

    # 5. deletion-vector retraction: metadata-only (file bytes untouched)
    res = delete_rows(spark, table, "source = 'src0'", write_cdf=True)
    print(
        f"dv delete: {res['rows_deleted']} rows via {res['files_dv']} DVs, "
        f"{res['files_rewritten']} rewrites"
    )

    # 6. OPTIMIZE: compact + materialize DVs, cluster by (lang, n_chars)
    compact_fallback(spark, table, z_order_by=["n_chars"])
    log = DeltaLog(table)
    adds = log.snapshot_files(log.latest_version())
    assert all(not a.get("deletionVector") for a in adds)
    print("optimize: DVs materialized,", len(adds), "files")

    # 7. time travel + history
    hist = table_history(table)
    ops = [h["operation"] for h in hist]
    print("history (newest first):", ops[:6])
    v0_count = read_table(spark, table, version=0).count()
    print("as-of v0:", v0_count, "rows (pre-merge, pre-delete)")

    # 8. stats are part of the log: every active file carries them
    assert all(json.loads(a["stats"])["numRecords"] > 0 for a in adds)

    # 9. vacuum the copy-on-write tombstones
    removed = vacuum_fallback(table, retention_hours=0.0)
    print("vacuum reclaimed", len(removed), "files")
    print("final:", read_table(spark, table).count(), "rows")

    # 10. round-6 surface: detail, ICT, row tracking, compaction
    from polars_incremental_spark.sinks.deltalog import (
        compact_log_range,
        enable_in_commit_timestamps,
        enable_row_tracking,
        read_delta_fallback,
        table_detail,
    )

    enable_in_commit_timestamps(table)  # monotone commit stamps from here on
    enable_row_tracking(table)  # backfills stable per-row ids
    ids = read_delta_fallback(spark, table, row_ids=True)
    print("row ids:", ids.select("_row_id").distinct().count(), "distinct")
    head = DeltaLog(table).latest_version()
    compact_log_range(table, 1, head)  # snapshot tail now ONE read
    d = table_detail(table)
    print(
        f"detail: v{d['version']}, {d['numFiles']} files, "
        f"{d['sizeInBytes']} bytes, features={d['writerFeatures']}"
    )

    shutil.rmtree(work)


if __name__ == "__main__":
    main()
