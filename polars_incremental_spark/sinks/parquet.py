"""Parquet micro-batch sink with idempotent batch naming.

Parity: ``write_parquet_batch`` (reference: src/polars_incremental/sinks/parquet.py:9-27).
Writing each micro-batch to ``batch_{id}`` and overwriting on replay turns
the pipeline's at-least-once delivery into effectively-once output.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet_batch(
    df: DataFrame,
    output_dir: str,
    batch_id: int,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Write one micro-batch to ``{output_dir}/batch_{batch_id}``; returns the path."""
    path = os.path.join(output_dir, f"batch_{batch_id}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def write_parquet_batch_observed(
    df: DataFrame,
    output_dir: str,
    batch_id: int,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    metrics: list | None = None,
) -> tuple[str, dict]:
    """``write_parquet_batch`` + observation metrics captured during the
    write execution itself — commit metadata (row counts etc.) with no
    second scan of the batch.  Returns (path, metrics dict)."""
    from ..observability import observed_action

    path = os.path.join(output_dir, f"batch_{batch_id}")

    def _write(mdf: DataFrame) -> None:
        writer = mdf.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    captured = observed_action(df, _write, *(metrics or []))
    return path, captured
