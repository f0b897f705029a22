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
    weight_col: str | None = None,
) -> DataFrame:
    """(row int, col int, cnt long) — the sparse Count-Min sketch of the
    ``key_col`` stream: one increment per input row, or ``weight_col``
    increments when given.  Weights make a PRE-AGGREGATED (key, count)
    frame an exact substitute for the raw stream — build the sketch and
    the exact counts from ONE explode+groupBy instead of scanning the
    corpus twice (the u18 plan), or fold upstream per-partition counts
    without expanding them back into rows.

    Plan: one projection computes all ``depth`` positions per item
    (posexplode of a depth-length array — map-side), then a single
    groupBy(row, col) sum whose partial aggregation bounds the shuffle at
    depth*width rows per task.  Never more than depth*width output rows
    total, by construction.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}x{width}")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    keyed = df.select(F.col(key_col).cast("string").alias("__k"), w.alias("__w"))
    pos = keyed.select(
        "__w",
        F.posexplode(
            F.array(*[cms_position(F.col("__k"), r, width) for r in range(depth)])
        ).alias("row", "col"),
    )
    return pos.groupBy("row", "col").agg(F.sum("__w").cast("long").alias("cnt"))


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


# --------------------------------------------------------------------------
# Persisted incremental CMS index — exactly-once additive sketch store
# --------------------------------------------------------------------------
#
# The incremental form of cms_build, shaped like dedup.update_bloom_index /
# incremental_lsh_dedup — but with a stricter store: bloom union is an
# idempotent OR and LSH replay dedupes by id, while CMS cells ADD, so
# folding the same batch twice silently corrupts every estimate.  The store
# therefore keeps a MANIFEST.json (atomic tmp+replace, mutated only under
# the pipeline's single-writer lock like every maintenance op here):
#
#   {"meta": {depth, width}, "active": [dir, ...], "folded": [id, ...]}
#
# - update: write the batch's sketch dir FIRST, then add it to the
#   manifest.  A crash between the two leaves an unreferenced dir; the
#   retry overwrites it and commits the manifest — exactly-once.
# - replay of an already-folded batch id is a NO-OP (returns False): its
#   counts are already in, whether its dir is still active or was consumed
#   by a compaction.
# - compaction: write the merged dir (unreferenced), atomically swap the
#   manifest (consumed dirs -> compact dir, their ids appended to
#   ``folded``), THEN delete sources.  Every crash window leaves only
#   unreferenced orphans, never double counts — the property the additive
#   sketch demands and the bloom store never needed.


def _cms_manifest_path(index_path: str) -> str:
    import os

    return os.path.join(index_path, "MANIFEST.json")


def _cms_read_manifest(index_path: str) -> dict | None:
    import json
    import os

    p = _cms_manifest_path(index_path)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _cms_write_manifest(index_path: str, manifest: dict) -> None:
    import json
    import os

    p = _cms_manifest_path(index_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, p)


def update_cms_index(
    df: DataFrame,
    index_path: str,
    *,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    batch_id: int | None = None,
) -> bool:
    """Fold one batch's key stream into the persisted sketch.  Returns
    True if folded, False if this batch id was already accounted for
    (idempotent replay — the retry contract Pipeline sinks rely on).

    Without a ``batch_id`` the id is content-addressed: an order-
    insensitive digest of the batch's own (row, col, cnt) sketch (bounded
    by depth*width rows), so retrying an identical ad-hoc batch is also a
    no-op rather than a double count.
    """
    import os
    import uuid

    meta = {"depth": depth, "width": width}
    os.makedirs(index_path, exist_ok=True)
    manifest = _cms_read_manifest(index_path)
    if manifest is None:
        manifest = {"meta": meta, "active": [], "folded": []}
    elif manifest["meta"] != meta:
        raise ValueError(
            f"cms index at {index_path} was built with {manifest['meta']}; "
            f"refusing update with {meta}"
        )

    sketch = cms_build(df, key_col=key_col, depth=depth, width=width)
    if batch_id is not None:
        bid = f"batch_{batch_id}"
    else:
        sketch = sketch.persist()
        row = sketch.agg(
            F.count("*").cast("long").alias("__n"),
            F.coalesce(F.expr("bit_xor(hash(row, col, cnt))"), F.lit(0))
            .cast("long")
            .alias("__x"),
        ).collect()[0]
        bid = f"adhoc_{row['__x'] & 0xFFFFFFFFFFFFFFFF:016x}_{row['__n']}"
    if bid in manifest["folded"]:
        if batch_id is None:
            sketch.unpersist()
        return False

    sub = f"sketch_{bid}_{uuid.uuid4().hex[:8]}"
    try:
        sketch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_path, sub)
        )
    finally:
        if batch_id is None:
            sketch.unpersist()
    manifest["active"].append(sub)
    manifest["folded"].append(bid)
    _cms_write_manifest(index_path, manifest)
    return True


def read_cms_index(spark, index_path: str) -> tuple[DataFrame, dict]:
    """(merged sketch, meta) — union of the manifest's active dirs run
    through cms_merge; bounded by depth*width rows regardless of history."""
    import os

    manifest = _cms_read_manifest(index_path)
    if manifest is None or not manifest["active"]:
        raise ValueError(f"cms index at {index_path} has no folded batches")
    dirs = [os.path.join(index_path, d) for d in manifest["active"]]
    return cms_merge(spark.read.parquet(*dirs)), manifest["meta"]


def cms_index_estimate(
    spark,
    index_path: str,
    keys: DataFrame,
    *,
    key_col: str,
    out_col: str = "est_count",
) -> DataFrame:
    """cms_estimate against the persisted index (parameters come from the
    manifest, so probes can never use a mismatched hash layout)."""
    sketch, meta = read_cms_index(spark, index_path)
    return cms_estimate(
        sketch,
        keys,
        key_col=key_col,
        depth=meta["depth"],
        width=meta["width"],
        out_col=out_col,
    )


def compact_cms_index(spark, index_path: str) -> int:
    """Merge all active sketch dirs into one (small-file maintenance).
    Returns the number of dirs consumed.  Safe against every crash
    window: the compacted dir is invisible until the atomic manifest swap,
    and source dirs are deleted only after it — orphans are possible,
    double counts are not.  Run under the pipeline single-writer lock."""
    import os
    import shutil
    import uuid

    manifest = _cms_read_manifest(index_path)
    if manifest is None or len(manifest["active"]) <= 1:
        return 0
    old = list(manifest["active"])
    merged = cms_merge(
        spark.read.parquet(*[os.path.join(index_path, d) for d in old])
    )
    sub = f"sketch_compact_{uuid.uuid4().hex[:8]}"
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_path, sub)
    )
    manifest["active"] = [sub]
    _cms_write_manifest(index_path, manifest)
    for d in old:
        shutil.rmtree(os.path.join(index_path, d), ignore_errors=True)
    return len(old)


# --------------------------------------------------------------------------
# Bottom-k-sample quantile sketch — the third leg of the deterministic trio
# --------------------------------------------------------------------------
#
# KMV answers distinct-count, CMS answers frequency; this answers
# QUANTILES with the same contracts: bounded (k values per group),
# mergeable (bottom-k by hash of a union is the bottom-k of the merged
# bottom-k's), and deterministic (inclusion is decided by the salted md5
# of a ROW IDENTITY — hashing the value itself would correlate duplicate
# values' inclusion and bias the sample).  The k kept rows are a uniform
# random sample of the group, so the nearest-rank estimate carries the
# standard sampling error ~ sqrt(q(1-q)/k) in rank space; Spark's native
# percentile_approx (KLL-ish) has tighter guarantees at equal memory but,
# like HLL, engine-defined results — this one any engine replays exactly.


def quantile_sketch(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """(group..., qsk array<struct<h long, v double>>) — the k sample rows
    with smallest salted row-identity hash per group, h-sorted.

    Same plan shape as kmv_sketch: hash projected in-scan, one shuffle on
    the group keys, ranking window on that partitioning for bottom-k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    gcols = [F.col(c) for c in group_cols]
    hashed = df.select(
        *gcols,
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit(":qs"))).alias(
            "__h"
        ),
        F.col(value_col).cast("double").alias("__v"),
    )
    # __v tiebreak: md5 collisions are ~2^-40 at 1e6 rows/group, but a tie
    # broken differently by another engine would swap the boundary sample
    # row — order by (hash, value) everywhere, including the SQL twins.
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__h").asc(), F.col("__v").asc()
    )
    return (
        hashed.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")))
            ).alias("qsk")
        )
    )


def quantile_sketch_merge(
    sketches: DataFrame,
    *,
    group_cols: Sequence[str],
    k: int = 256,
) -> DataFrame:
    """Bottom-k of the union of per-batch samples — merge(sketch(A),
    sketch(B)) == sketch(A ++ B) exactly when A and B are disjoint row
    sets (the per-batch case; shared rows dedup by hash)."""
    exploded = sketches.select(
        *[F.col(c) for c in group_cols], F.explode("qsk").alias("e")
    ).select(
        *group_cols, F.col("e.h").alias("__h"), F.col("e.v").alias("__v")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__h").asc(), F.col("__v").asc()
    )
    return (
        exploded.distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")))
            ).alias("qsk")
        )
    )


def quantile_estimate_expr(qsk_col: str, q: float):
    """Nearest-rank estimate from a sketch array: the ceil(q*m)-th
    smallest sampled VALUE (m = sample size, index clamped to [1, m]).
    Plain ceil on an IEEE product + element_at — identical in any engine;
    no interpolation, so the result is always an actual data value."""
    vals = F.array_sort(F.transform(F.col(qsk_col), lambda x: x["v"]))
    m = F.size(vals)
    idx = F.greatest(
        F.lit(1), F.least(m, F.ceil(F.lit(q) * m).cast("int"))
    )
    return F.element_at(vals, idx)


def kmv_set_ops(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV set-operation estimates for every pair of groups: approximate
    ``|values(a) ∪ values(b)|`` and ``|values(a) ∩ values(b)|`` computed
    purely from the per-group bottom-k sketches — the union by merging the
    two hash arrays (bottom-k of the combined set, the KMV mergeability
    property), the intersection via the standard KMV Jaccard estimator
    (the fraction of union-sketch members present in BOTH side sketches,
    scaled by the union estimate — Beyer et al., SIGMOD'07).

    Exact counts ride beside the estimates so sketch error is visible in
    the output: (type_a, type_b, est_union, est_intersection, exact_union,
    exact_intersection).

    Scale: the sketch build is u4's one keyed shuffle; everything after
    operates on |groups| rows of k-bounded arrays — the pair frame is
    |groups|² tiny and the array math is per-row Catalyst expressions, so
    at 100 TB the corpus is scanned once and the set algebra costs
    nothing.  (The exact companions are for test-scale visibility; at
    production scale drop them and no corpus self-join exists at all.)
    """
    sk_df = kmv_sketch(df, group_cols=[group_col], value_col=value_col, k=k)
    a = sk_df.select(
        F.col(group_col).alias("type_a"), F.col("kmv_hashes").alias("__ha")
    )
    b = sk_df.select(
        F.col(group_col).alias("type_b"), F.col("kmv_hashes").alias("__hb")
    )
    # all-pairs of per-group SKETCHES: |groups|² rows of bounded arrays — a
    # nested-loop join over broadcast-sized frames is the correct plan here
    # (plan-audit allowlisted, same class as the 1-row scalar attaches)
    pairs = a.join(b, F.col("type_a") < F.col("type_b"), "inner")
    union_sk = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("__ha"), F.col("__hb")))),
        1,
        k,
    )
    pairs = pairs.withColumn("__u", union_sk)
    n_u = F.size(F.col("__u"))
    est_union = F.when(n_u < k, n_u.cast("long")).otherwise(
        F.round(
            F.lit(float(k - 1))
            * F.lit(float(KMV_SPACE))
            / F.element_at(F.col("__u"), k).cast("double")
        ).cast("long")
    )
    n_both = F.size(
        F.array_intersect(F.array_intersect(F.col("__u"), F.col("__ha")), F.col("__hb"))
    )
    est = pairs.select(
        "type_a",
        "type_b",
        est_union.alias("est_union"),
        F.round(est_union * n_both / n_u).cast("long").alias("est_intersection"),
    )
    # exact companions (test-scale visibility): distinct incidence pairs,
    # per-value work bounded by |groups| — same shape as s13
    ut = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).distinct()
    n_exact = ut.groupBy("__g").agg(F.count("*").cast("long").alias("__n"))
    both_exact = (
        ut.join(ut.select(F.col("__g").alias("__g2"), "__v"), "__v")
        .filter(F.col("__g") < F.col("__g2"))
        .groupBy(F.col("__g").alias("type_a"), F.col("__g2").alias("type_b"))
        .agg(F.count("*").cast("long").alias("exact_intersection"))
    )
    exact = (
        both_exact.join(
            n_exact.withColumnRenamed("__g", "type_a").withColumnRenamed("__n", "__na"),
            "type_a",
        )
        .join(
            n_exact.withColumnRenamed("__g", "type_b").withColumnRenamed("__n", "__nb"),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            (F.col("__na") + F.col("__nb") - F.col("exact_intersection")).alias(
                "exact_union"
            ),
            "exact_intersection",
        )
    )
    # outer on the exact side: group pairs with NO shared value never form
    # a both_exact row but still carry sketch estimates
    out = est.join(exact, ["type_a", "type_b"], "left")
    na = n_exact.withColumnRenamed("__g", "type_a").withColumnRenamed("__n", "__na")
    nb = n_exact.withColumnRenamed("__g", "type_b").withColumnRenamed("__n", "__nb")
    return (
        out.join(na, "type_a")
        .join(nb, "type_b")
        .select(
            "type_a",
            "type_b",
            "est_union",
            "est_intersection",
            F.coalesce(F.col("exact_union"), F.col("__na") + F.col("__nb")).alias(
                "exact_union"
            ),
            F.coalesce(F.col("exact_intersection"), F.lit(0).cast("long")).alias(
                "exact_intersection"
            ),
        )
    )
