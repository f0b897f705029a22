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

import math
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
# HyperLogLog — deterministic, cross-engine-reproducible variant
# --------------------------------------------------------------------------
#
# The industry-standard distinct sketch (Flajolet et al. 2007), built so
# any engine with md5 reproduces the ESTIMATE bit-for-bit — the same
# portability contract as KMV above, closing the one gap KMV leaves:
# KMV's sketch is O(k) values per group, HLL is a FIXED 2^b registers of
# 6 bits each regardless of cardinality, and merge is a cell-wise max
# (commutative, idempotent), so per-batch / per-partition sketches roll up
# with no resort step.  Spark's own approx_count_distinct is HLL++ with an
# implementation-defined estimate; this variant trades its bias
# corrections for determinism (error ~ 1.04/sqrt(m), ~13% at m=64).
#
# Determinism notes (why every step is engine-portable):
# - register index = low b bits of the 60-bit md5 hash; rank = leading-
#   zero count of the remaining P=60-b bits, computed as P+1-length(bin(w))
#   — string length of the minimal binary form, no float log2.
# - the harmonic sum Z = sum(2^-M_j) is kept EXACT: scaled by 2^(P+1) it
#   is an integer sum of shiftleft(1L, P+1-M_j) terms (max m*2^(P+1) =
#   2^61 at any b — always fits a BIGINT), so no float-summation-order
#   nondeterminism can enter.
# - the only float ops are one division (alpha*m^2*2^(P+1), a Python-baked
#   literal, over the exact integer sum) and the small-range linear-
#   counting branch, which takes one of m precomputed m*ln(m/V) literals
#   (V in 1..m) baked identically into the Spark plan and the SQL oracle.
#
# Greenfield Spark work (no reference counterpart).

HLL_HASH_BITS = 60  # md5_long(n_hex=15)


def _hll_params(b: int) -> tuple[int, int, float]:
    """(m, scale, alpha_m) for 2^b registers over a 60-bit hash."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16]; got {b}")
    m = 1 << b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    return m, HLL_HASH_BITS - b + 1, alpha


def hll_sketch(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 6,
    out_col: str = "hll_regs",
) -> DataFrame:
    """(group..., out_col array<struct<j:int, r:int>>) — per-group HLL
    registers, sparse (only registers that saw a value), sorted by j.

    Plan shape at 100 TB: hash projected in-scan, one shuffle on
    (group, register) with map-side partial max (2^b rows per group per
    partition AT MOST — the sketch property), then a bounded collect_list
    per group.  No corpus-sized state crosses the exchange twice."""
    m, scale, _ = _hll_params(b)
    p = HLL_HASH_BITS - b
    h = md5_long(F.col(value_col).cast("string"))
    w = F.shiftright(h, b)
    rank = F.when(w == 0, F.lit(p + 1)).otherwise(
        F.lit(p + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *[F.col(c) for c in group_cols],
            (h.bitwiseAND(m - 1)).cast("int").alias("__j"),
            rank.cast("int").alias("__r"),
        )
        .groupBy(*group_cols, "__j")
        .agg(F.max("__r").alias("__mr"))
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__j").alias("j"), F.col("__mr").alias("r")))
            ).alias(out_col)
        )
    )


def hll_merge(
    sketches: DataFrame,
    *,
    group_cols: Sequence[str],
    regs_col: str = "hll_regs",
) -> DataFrame:
    """Merge per-batch/per-partition sketches: cell-wise register max —
    commutative and idempotent, so sketches roll up across incremental
    batches (or a partial re-send) without re-scanning history."""
    exploded = sketches.select(
        *[F.col(c) for c in group_cols], F.explode(F.col(regs_col)).alias("__x")
    )
    return (
        exploded.groupBy(*group_cols, F.col("__x.j").alias("__j"))
        .agg(F.max("__x.r").alias("__mr"))
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__j").alias("j"), F.col("__mr").alias("r")))
            ).alias(regs_col)
        )
    )


def hll_cumulative(
    sketches: DataFrame,
    *,
    order_col: str,
    regs_col: str = "hll_regs",
) -> DataFrame:
    """(order_col, regs_col) — register state of the UNION of all batches
    up to and including each ``order_col`` value: sketch algebra for
    corpus-novelty curves (cumulative distinct per crawl batch, and the
    newly-seen delta between consecutive batches).

    Shape: explode the per-batch registers once, join the (tiny, distinct)
    batch list on batch <= k — the only fan-out is per-register rows ×
    number of batches, i.e. ≤ 2^b · n_batches² rows TOTAL regardless of
    corpus size, because the inputs are already sketches.  No window over
    raw data, no rescan of history — the property that lets the curve
    extend incrementally as new batches land."""
    ks = sketches.select(F.col(order_col).alias("__k")).distinct()
    exploded = sketches.select(
        F.col(order_col), F.explode(F.col(regs_col)).alias("__x")
    )
    return (
        exploded.join(F.broadcast(ks), F.col(order_col) <= F.col("__k"))
        .groupBy(F.col("__k").alias(order_col), F.col("__x.j").alias("__j"))
        .agg(F.max("__x.r").alias("__mr"))
        .groupBy(order_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__j").alias("j"), F.col("__mr").alias("r"))
                )
            ).alias(regs_col)
        )
    )


# The estimator's linear-counting branch bakes a 2^b-entry literal table
# into the Catalyst plan (hll_estimate_expr) / the oracle SQL string
# (sql_hll_estimate_over) — at b=16 that is 65,536 literals, a plan-size /
# codegen blowup.  Sketching (hll_sketch / the index store) still accepts
# b up to 16; only ESTIMATION is capped — estimate a wider sketch by
# folding registers down before calling (or raise this after replacing the
# baked table with an expression if a use case ever needs it).
_HLL_ESTIMATOR_MAX_B = 12


def _check_estimator_b(b: int) -> None:
    if b > _HLL_ESTIMATOR_MAX_B:
        raise ValueError(
            f"HLL estimation bakes a 2^b-entry linear-counting literal "
            f"table into the plan; b={b} exceeds the supported maximum "
            f"{_HLL_ESTIMATOR_MAX_B} (= {1 << _HLL_ESTIMATOR_MAX_B} "
            f"literals). Sketch with b<={_HLL_ESTIMATOR_MAX_B} or fold "
            f"registers down before estimating."
        )


def hll_estimate_expr(regs_col: str, b: int = 6):
    """Distinct-count estimate from a register array — the deterministic
    HLL estimator: exact-integer harmonic sum, baked-literal alpha and
    linear-counting table (see module notes).  ``b`` is capped at
    ``_HLL_ESTIMATOR_MAX_B`` — the LC table is a baked 2^b-literal array."""
    _check_estimator_b(b)
    m, scale, alpha = _hll_params(b)
    numer = alpha * m * m * float(1 << scale)  # Python-baked double literal
    s = F.expr(
        f"aggregate({regs_col}, "
        f"cast(({m} - size({regs_col})) as bigint) * shiftleft(cast(1 as bigint), {scale}), "
        f"(acc, x) -> acc + shiftleft(cast(1 as bigint), {scale} - x.r))"
    )
    v = F.lit(m) - F.size(F.col(regs_col))  # empty registers
    raw = F.lit(numer) / s.cast("double")
    lc_table = F.array(*[F.lit(m * math.log(m / i)) for i in range(1, m + 1)])
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.element_at(lc_table, v)
    ).otherwise(raw)
    return F.round(est).cast("long")


def hll_distinct(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 6,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """(group..., approx_distinct long) — sketch + estimate in one call."""
    sk = hll_sketch(df, group_cols=group_cols, value_col=value_col, b=b)
    return sk.select(
        *[F.col(c) for c in group_cols],
        hll_estimate_expr("hll_regs", b).alias(out_col),
    )


def sql_hll_reg_exprs(b: int = 6) -> tuple[str, str]:
    """(register-index SQL, rank SQL) over a hash column ``h`` — the
    shared primitive for any DuckDB twin that groups registers itself."""
    m, _, _ = _hll_params(b)
    p = HLL_HASH_BITS - b
    return (
        f"(h & {m - 1})",
        f"CASE WHEN (h >> {b}) = 0 THEN {p + 1} "
        f"ELSE {p + 1} - length(bin(h >> {b})) END",
    )


def sql_hll_estimate_over(
    regs_rel: str, *, group_col: str = "g", b: int = 6, out_col: str = "approx_distinct"
) -> str:
    """SELECT over a (``group_col``, j, mr) register relation producing
    (``group_col``, ``out_col``) — the DuckDB twin of hll_estimate_expr,
    generated from the SAME Python constants (alpha literal, ln table) so
    the engines can never drift.  Composable: cumulative/merged register
    relations estimate through the identical expression.  ``b`` capped at
    ``_HLL_ESTIMATOR_MAX_B`` (the LC branch emits 2^b CASE arms)."""
    _check_estimator_b(b)
    m, scale, alpha = _hll_params(b)
    numer = repr(alpha * m * m * float(1 << scale))
    lc_cases = " ".join(
        f"WHEN {i} THEN {m * math.log(m / i)!r}" for i in range(1, m + 1)
    )
    return f"""
SELECT {group_col},
       CAST(round(CASE WHEN {numer} / s <= {2.5 * m!r} AND v > 0
                       THEN CASE v {lc_cases} END
                       ELSE {numer} / s END) AS BIGINT) AS {out_col}
FROM (
  SELECT {group_col},
         SUM(1::BIGINT << ({scale} - mr))
           + ({m} - COUNT(*)) * (1::BIGINT << {scale}) AS s,
         {m} - COUNT(*) AS v
  FROM {regs_rel} GROUP BY {group_col}
)
"""


def sql_hll_estimate(
    table_expr: str,
    *,
    group_col: str,
    value_expr: str,
    b: int = 6,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB twin of hll_distinct — hash/register/estimate CTEs built
    from the shared primitives above."""
    jx, rx = sql_hll_reg_exprs(b)
    est = sql_hll_estimate_over("__hll_m", group_col="g", b=b, out_col=out_col)
    # md5 hash twin lives in queries._sql_md5_long; callers interpolate it
    return f"""
WITH __hll_h AS (
  SELECT DISTINCT {group_col} AS g, {value_expr} AS h FROM {table_expr}
),
__hll_reg AS (
  SELECT g, {jx} AS j, {rx} AS r
  FROM __hll_h
),
__hll_m AS (SELECT g, j, MAX(r) AS mr FROM __hll_reg GROUP BY g, j)
SELECT g AS {group_col}, {out_col} FROM ({est})
"""


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


# Content-addressed fold ids ("adhoc_*") are digests of the batch's own
# sketch rows; the SCHEME that produced them must match when replay
# detection compares against manifest["folded"], or a previously-folded
# batch re-folds and (for CMS, whose cell sums are not idempotent)
# silently double-counts.  The scheme is therefore versioned in the
# manifest, and content-addressed updates refuse manifests stamped with a
# different (or no) scheme — explicit ``batch_id`` folds are
# scheme-independent and always allowed.
_ADHOC_DIGEST_SCHEME = "md5-60"


# the pre-md5-60 (32-bit Murmur3 xor) scheme produced the same
# "adhoc_{x:016x}_{n}" SHAPE but from a sign-extended 32-bit value: the
# first 8 hex are always 00000000 or ffffffff.  An md5-60 id has 15
# random hex after its leading 0, so a true md5-60 id false-matching
# this is a ~2^-28 event — and the consequence of a false match is the
# fail-closed error below, never a silent re-fold.
import re as _re

_LEGACY_ADHOC_RE = _re.compile(r"^adhoc_(00000000|ffffffff)[0-9a-f]{8}_")


def _check_adhoc_digest_scheme(manifest: dict, index_path: str, kind: str) -> None:
    """Gate a content-addressed (batch_id=None) fold on digest-scheme
    compatibility.  Unversioned manifests (written before the ``digest``
    key existed) are upgraded in place UNLESS they hold an id of the
    legacy 32-bit shape — those are the ones whose replay detection
    would silently re-fold (the CMS double-count ADVICE r10 flagged);
    unversioned manifests whose adhoc ids are all md5-60-shaped were
    produced by the identical digest expression and stay valid."""
    scheme = manifest.get("digest")
    if scheme == _ADHOC_DIGEST_SCHEME:
        return
    if scheme is None and not any(
        _LEGACY_ADHOC_RE.match(str(f)) for f in manifest["folded"]
    ):
        manifest["digest"] = _ADHOC_DIGEST_SCHEME
        return
    raise ValueError(
        f"{kind} index at {index_path} holds content-addressed fold ids "
        f"from digest scheme {scheme or 'unversioned (pre-md5-60)'}; "
        f"replay detection against them under scheme "
        f"{_ADHOC_DIGEST_SCHEME} could silently re-fold an "
        f"already-counted batch. Pass an explicit batch_id (scheme-"
        f"independent) or rebuild the index."
    )


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
        manifest = {
            "meta": meta,
            "digest": _ADHOC_DIGEST_SCHEME,
            "active": [],
            "folded": [],
        }
    elif manifest["meta"] != meta:
        raise ValueError(
            f"cms index at {index_path} was built with {manifest['meta']}; "
            f"refusing update with {meta}"
        )

    sketch = cms_build(df, key_col=key_col, depth=depth, width=width)
    if batch_id is not None:
        bid = f"batch_{batch_id}"
    else:
        _check_adhoc_digest_scheme(manifest, index_path, "cms")
        sketch = sketch.persist()
        row = sketch.agg(
            F.count("*").cast("long").alias("__n"),
            # 60-bit md5 per row (not 32-bit Murmur3): with the row
            # count alongside, a colliding distinct batch needs a 2^60
            # birthday hit, not 2^32 — a collision here silently refuses
            # a genuinely new batch (returns False) and undercounts
            F.coalesce(
                F.expr(
                    "bit_xor(cast(conv(substring(md5(concat_ws(char(1), "
                    "row, col, cnt)), 1, 15), 16, 10) as bigint))"
                ),
                F.lit(0),
            )
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
# Persisted HLL index — incremental distinct-count over batches
# --------------------------------------------------------------------------
#
# The HLL sibling of the CMS index store above (same manifest layout,
# same crash windows), with one property the CMS store can NOT have:
# register merge is max(), which is IDEMPOTENT — re-folding the same
# batch cannot corrupt the estimate, only waste a subdir.  The folded-id
# accounting is therefore storage hygiene here, not a correctness
# requirement (for CMS it is load-bearing: cell sums double-count).
# The test suite still asserts replay returns False, keeping the two
# stores behaviorally interchangeable inside Pipeline writers.


def update_hll_index(
    df: DataFrame,
    index_path: str,
    *,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 6,
    batch_id: int | None = None,
) -> bool:
    """Fold one batch into the persisted per-group register store.
    Returns True if folded, False on an already-accounted batch id
    (content-addressed when ``batch_id`` is None, as for CMS)."""
    import os
    import uuid

    # The store's only estimation path is hll_index_distinct, whose
    # baked linear-counting table caps b — reject here at WRITE time so
    # a wide index can't be built, grown, and compacted only to fail the
    # first time it is read (ADVICE r10).
    _check_estimator_b(b)
    meta = {"b": b, "group_cols": list(group_cols), "value_col": value_col}
    os.makedirs(index_path, exist_ok=True)
    manifest = _cms_read_manifest(index_path)
    if manifest is None:
        manifest = {
            "meta": meta,
            "digest": _ADHOC_DIGEST_SCHEME,
            "active": [],
            "folded": [],
        }
    elif manifest["meta"] != meta:
        raise ValueError(
            f"hll index at {index_path} was built with {manifest['meta']}; "
            f"refusing update with {meta}"
        )

    sketch = hll_sketch(df, group_cols=group_cols, value_col=value_col, b=b)
    if batch_id is not None:
        bid = f"batch_{batch_id}"
    else:
        _check_adhoc_digest_scheme(manifest, index_path, "hll")
        sketch = sketch.persist()
        gref = ", ".join(f"`{c}`" for c in group_cols)
        row = (
            sketch.select(*group_cols, F.explode("hll_regs").alias("__e"))
            .agg(
                F.count("*").cast("long").alias("__n"),
                # same 60-bit md5 digest as update_cms_index — a 32-bit
                # xor collision would silently drop a new batch's registers
                F.coalesce(
                    F.expr(
                        "bit_xor(cast(conv(substring(md5(concat_ws(char(1), "
                        f"{gref}, __e.j, __e.r)), 1, 15), 16, 10) as bigint))"
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("__x"),
            )
            .collect()[0]
        )
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


def read_hll_index(spark, index_path: str) -> tuple[DataFrame, dict]:
    """(merged per-group registers, meta) — bounded by 2^b rows of state
    per group regardless of folded history."""
    import os

    manifest = _cms_read_manifest(index_path)
    if manifest is None or not manifest["active"]:
        raise ValueError(f"hll index at {index_path} has no folded batches")
    meta = manifest["meta"]
    dirs = [os.path.join(index_path, d) for d in manifest["active"]]
    merged = hll_merge(
        spark.read.parquet(*dirs), group_cols=meta["group_cols"]
    )
    return merged, meta


def hll_index_distinct(
    spark, index_path: str, *, out_col: str = "approx_distinct"
) -> DataFrame:
    """(group..., approx_distinct) from the persisted index — parameters
    come from the manifest so probes can never use a mismatched layout."""
    merged, meta = read_hll_index(spark, index_path)
    return merged.select(
        *[F.col(c) for c in meta["group_cols"]],
        hll_estimate_expr("hll_regs", b=meta["b"]).alias(out_col),
    )


def compact_hll_index(spark, index_path: str) -> int:
    """Merge active subdirs into one — same crash contract as the CMS
    compactor (atomic manifest swap first, source deletes after), and
    doubly safe here because a re-read of a half-deleted overlap can only
    re-merge registers idempotently."""
    import os
    import shutil
    import uuid

    manifest = _cms_read_manifest(index_path)
    if manifest is None or len(manifest["active"]) <= 1:
        return 0
    old = list(manifest["active"])
    merged = hll_merge(
        spark.read.parquet(*[os.path.join(index_path, d) for d in old]),
        group_cols=manifest["meta"]["group_cols"],
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
