"""Bucketed tables: pay the join/agg shuffle ONCE at write time.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem) is
shuffling both sides on the key for every query.  Writing each side as a
bucketed table hash-partitions the FILES by the key: every later
sort-merge join or aggregation on that key reads co-located buckets and
runs with ZERO shuffle exchanges — the plan check in this module proves it
from the physical plan, not by assumption.

Recipe (``write_bucketed``): repartition to one task per bucket so each
bucket is one file (otherwise every write task emits a file per bucket —
tasks × buckets small files), then ``bucketBy(n, key).sortBy(key)`` so
sort-merge joins also skip the per-partition sort.

Caveats that matter at scale, encoded here rather than left to folklore:
- Both join sides must use the SAME bucket count (Spark does not merge
  mismatched bucketing; one side would shuffle).
- Bucket pruning applies to equality filters on the bucket column — point
  lookups touch 1/n of the files.
- A broadcast join would ignore bucketing entirely; ``bucketed_join``
  hints sort-merge so the co-location is actually used.

Reference parity: greenfield — the single-node reference has no concept of
pre-partitioned storage; this is the Spark-native answer to its "repeated
join on the same key" workloads.
"""

from __future__ import annotations

import contextlib
import io
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange nodes in the physical plan (broadcast
    exchanges excluded — they move the small side only)."""
    plan = physical_plan(df)
    return len(re.findall(r"(?<!Broadcast)Exchange", plan))


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) catalog table."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1; got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format(format)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str | tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key, hinted to
    sort-merge so the bucket co-location is used instead of a broadcast
    (which would read both sides unbucketed).

    ``on``: a column name shared by both tables, a list of shared names,
    or (left_col, right_col) pairs for differently-named keys (the TPC-H
    ``o_orderkey`` / ``l_orderkey`` case).
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    if isinstance(on, str):
        return left.join(right, on, how)
    pairs = [(c, c) if isinstance(c, str) else c for c in on]
    if all(l == r for l, r in pairs):
        return left.join(right, [l for l, _ in pairs], how)
    cond = None
    for l, r in pairs:
        piece = left[l] == right[r]
        cond = piece if cond is None else cond & piece
    return left.join(right, cond, how)
