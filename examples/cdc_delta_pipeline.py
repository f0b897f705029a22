"""CDC into a Delta table + change-feed readback (reference examples
cdc_apply_delta.py + delta_cdf.py), jar-free via the fallback log writer.

Run: python examples/cdc_delta_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_incremental_spark import DeltaSource, Pipeline, get_spark
from polars_incremental_spark.maintenance import optimize_delta_table, vacuum_delta_table
from polars_incremental_spark.sinks.delta import apply_cdc_table, read_table


def main() -> None:
    spark = get_spark("cdc-delta-demo")
    work = tempfile.mkdtemp(prefix="pis_cdc_")
    target = os.path.join(work, "users")

    cols = ["user_id", "name", "_change_type", "_commit_version"]
    batch1 = spark.createDataFrame(
        [(1, "ada", "insert", 1), (2, "bob", "insert", 1)], cols
    )
    print("apply 1:", apply_cdc_table(spark, batch1, target, keys=["user_id"], write_change_feed=True))

    batch2 = spark.createDataFrame(
        [(1, "ada2", "update_postimage", 2), (2, None, "delete", 2), (3, "eve", "insert", 2)],
        cols,
    )
    print("apply 2:", apply_cdc_table(spark, batch2, target, keys=["user_id"], write_change_feed=True))
    print("final table:")
    read_table(spark, target).orderBy("user_id").show()

    # downstream: consume the CHANGE FEED incrementally through a Delta source
    seen = []
    pipe = Pipeline(
        source=DeltaSource(path=target, read_change_feed=True, start_offset="earliest"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        writer=lambda df: seen.extend(
            (r["user_id"], r["_change_type"], r["_commit_version"]) for r in df.collect()
        ),
    )
    pipe.run(spark)
    print("change feed seen downstream:", sorted(seen))

    # time travel + history + restore: audit what each merge did, read the
    # pre-merge snapshot, and roll the table back (a NEW commit, so the
    # rollback itself is auditable)
    from polars_incremental_spark import restore_table, table_history

    for entry in table_history(target):
        print(
            f"  v{entry['version']}: {entry['operation']} "
            f"+{entry['n_files_added']}/-{entry['n_files_removed']} files"
        )
    before_merge2 = read_table(spark, target, version=0).count()
    print(f"time travel: {before_merge2} rows as of v0")
    restore_table(target, version=0)
    print("restored to v0:", read_table(spark, target).count(), "rows")

    optimize_delta_table(spark, target)
    removed = vacuum_delta_table(spark, target, retention_hours=0.0)
    print(f"maintenance: compacted; vacuum removed {len(removed)} stale files")
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
