"""Distinct-count sketching that is DETERMINISTIC across engines.

Spark's native sketches (``approx_count_distinct`` HLL++, DataSketches
``hll_sketch_agg``) are the right tool at 100 TB — mergeable partial
aggregates, fixed memory — but their estimates are implementation-defined,
so no cross-engine oracle can pin them.  KMV (k-minimum-values) gives the
same mergeable-sketch shape with a fully deterministic estimate: hash each
value uniformly onto [0, 2^60) with md5, keep the k smallest hashes per
group, and estimate distinct ≈ (k-1) · SPACE / kth_min.  Any engine with
md5 reproduces it bit-for-bit (the portability contract shared with
MinHash / the sampling operators).

Accuracy is the textbook KMV bound: relative error ~ 1/sqrt(k-2)
(~13% at k=64, ~6% at k=256).  Merging sketches = keeping the k smallest
of the union, so per-batch sketches roll up without re-scanning history.

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import md5_long

KMV_SPACE = 1 << 60


def _bottom_k(
    hashed: DataFrame, group_cols: Sequence[str], k: int, out_col: str
) -> DataFrame:
    """(group..., out_col array<long>) — k smallest distinct ``__h`` per
    group: ranking window on the groupBy partitioning (no second exchange),
    sorted array out.  Shared by sketch build and merge so tie/NULL
    handling can never diverge between them."""
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
    return (
        hashed.distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("__h")).alias(out_col))
    )


def kmv_sketch(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group..., kmv_hashes array<long>) — the k smallest distinct value
    hashes per group, i.e. the mergeable sketch itself.

    Plan: project the 8-byte hash in-scan → (group, hash) distinct (the
    only full shuffle, on fixed-width keys) → per-group bottom-k via a
    ranking window on the same partitioning (no second exchange).
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 for the KMV estimator; got {k}")
    gcols = [F.col(c) for c in group_cols]
    hashed = df.select(
        *gcols, md5_long(F.col(value_col).cast("string")).alias("__h")
    )
    return _bottom_k(hashed, group_cols, k, "kmv_hashes")


def kmv_estimate_expr(hashes_col: str, k: int):
    """Distinct-count estimate from a sketch array: exact when the group
    had fewer than k distinct values, else (k-1) · SPACE / kth_min —
    double arithmetic, rounded, identical in any engine."""
    n = F.size(F.col(hashes_col))
    kth = F.element_at(F.col(hashes_col), k)
    return F.when(n < k, n.cast("long")).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / kth.cast("double")
        ).cast("long")
    )


def kmv_distinct(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """(group..., approx_distinct long) — sketch + estimate in one call."""
    sk = kmv_sketch(df, group_cols=group_cols, value_col=value_col, k=k)
    return sk.select(
        *[F.col(c) for c in group_cols],
        kmv_estimate_expr("kmv_hashes", k).alias(out_col),
    )


def kmv_merge(
    sketches: DataFrame,
    *,
    group_cols: Sequence[str],
    hashes_col: str = "kmv_hashes",
    k: int = 64,
) -> DataFrame:
    """Merge per-partition/per-batch sketches: k smallest of the union of
    each group's hash sets — the property that makes KMV roll up across
    incremental batches without re-scanning history."""
    exploded = sketches.select(
        *[F.col(c) for c in group_cols], F.explode(F.col(hashes_col)).alias("__h")
    )
    return _bottom_k(exploded, group_cols, k, hashes_col)
