"""End-to-end incremental job demo (reference scripts/end_to_end_job_demo.py).

Lands parquet files in a drop directory, runs a checkpointed Pipeline
(read → window-aggregate → write), lands more data, reruns — only the new
files process.  Finishes with checkpoint inspection + cleanup.

Run: python examples/end_to_end_job.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark import FilesSource, LoggingObserver, Pipeline, get_spark
from polars_incremental_spark.maintenance import cleanup_checkpoint, inspect_checkpoint
from polars_incremental_spark.sinks.parquet import write_parquet_batch
from polars_incremental_spark.tables import load_table


def main() -> None:
    spark = get_spark("end-to-end-demo")
    work = tempfile.mkdtemp(prefix="pis_demo_")
    land, ckpt, out = (os.path.join(work, d) for d in ("landing", "ckpt", "out"))

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    events.limit(600).write.parquet(os.path.join(land, "drop_1.parquet"))

    def transform(df):
        return df.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count("*").alias("n"))

    def writer(df, batch_id):
        write_parquet_batch(df, out, batch_id)
        return {"rows": df.count()}

    pipeline = Pipeline(
        source=FilesSource(path=land, file_format="parquet"),
        checkpoint_dir=ckpt,
        transform=transform,
        writer=writer,
        observer=LoggingObserver(),
    )
    print("run 1:", pipeline.run(spark))

    events.limit(100).write.parquet(os.path.join(land, "drop_2.parquet"))
    print("run 2 (only drop_2 processes):", pipeline.run(spark))
    print("run 3 (idle):", pipeline.run(spark))

    info = inspect_checkpoint(ckpt)
    print(f"checkpoint: {info.n_commits} commits, latest={info.latest_commit_batch_id}")
    removed = cleanup_checkpoint(ckpt, keep_last_n=1)
    print(f"cleanup removed {len(removed)} old checkpoint files")
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
