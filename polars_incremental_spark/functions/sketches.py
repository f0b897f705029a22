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


# --------------------------------------------------------------------------
# Count-Min Sketch — frequency estimation / heavy hitters in fixed memory
# --------------------------------------------------------------------------
#
# The frequency-counting sibling of KMV: ``depth`` independent hash rows x
# ``width`` counters.  Item count estimate = min over rows of its cell — an
# OVERestimate only (collisions add, never subtract), within
# eps = e/width of the true count with probability 1 - e^-depth (Cormode &
# Muthukrishnan 2005).  Same determinism contract as KMV: row hashes are
# salted md5, so any engine replays the sketch bit-for-bit.
#
# Scale shape: the sketch is a SUM over (row, col) cells, so it map-side
# combines to <= depth*width rows per partition regardless of stream size,
# and per-batch sketches merge by adding cells (cms_merge) — the same
# roll-up-without-history property as KMV.  Estimation broadcasts the
# (bounded, <= depth*width-row) sketch against the key set: no shuffle of
# the corpus at all.


def cms_position(key: "F.Column", row: int, width: int) -> "F.Column":
    """Counter column for ``key`` in hash row ``row``: salted-md5 mod width.

    MUST stay identical between build and estimate (and any SQL replay) or
    estimates are garbage — the contract mirrored by _bloom_position.
    """
    return F.pmod(md5_long(F.concat(key, F.lit(f":cms{row}"))), F.lit(width))


def cms_build(
    df: DataFrame,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(row int, col int, cnt long) — the sparse Count-Min sketch of the
    ``key_col`` stream (one increment per input row; pre-aggregate first if
    you want distinct-per-group semantics).

    Plan: one projection computes all ``depth`` positions per item
    (posexplode of a depth-length array — map-side), then a single
    groupBy(row, col) count whose partial aggregation bounds the shuffle at
    depth*width rows per task.  Never more than depth*width output rows
    total, by construction.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    keyed = df.select(F.col(key_col).cast("string").alias("__k"))
    pos = keyed.select(
        F.posexplode(
            F.array(*[cms_position(F.col("__k"), r, width) for r in range(depth)])
        ).alias("row", "col")
    )
    return pos.groupBy("row", "col").agg(F.count("*").cast("long").alias("cnt"))


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cells add.

    CMS is a linear sketch, so merge(CMS(A), CMS(B)) == CMS(A ++ B)
    EXACTLY (not approximately) — the property the unit test pins.
    """
    return sketches.groupBy("row", "col").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est_count",
) -> DataFrame:
    """keys + (out_col long) — Count-Min estimate for every row of ``keys``
    (pass DISTINCT key rows; extra columns ride along through the group-by).

    The sketch is at most depth*width rows, so it is broadcast: estimating
    any number of keys costs one broadcast-hash-join plus a re-group on the
    keys' own columns — the corpus itself is never reshuffled.  Keys absent
    from the stream estimate 0 via the left join's coalesce.
    """
    carry = [c for c in keys.columns]
    pos = keys.select(
        *carry,
        F.posexplode(
            F.array(
                *[
                    cms_position(F.col(key_col).cast("string"), r, width)
                    for r in range(depth)
                ]
            )
        ).alias("row", "col"),
    )
    from pyspark.sql.functions import broadcast

    return (
        pos.join(broadcast(sketch), ["row", "col"], "left")
        .groupBy(*carry)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col))
    )
