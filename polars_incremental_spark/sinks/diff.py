"""Version diff: the row-level semantic delta between two table versions,
computed POST-HOC from snapshots — the audit tool for tables where CDF
was never enabled (the change feed records changes as they happen; this
reconstructs the NET change between any two readable versions).

Output schema matches the change-feed convention (``_change_type`` in
insert / delete / update_preimage / update_postimage) so downstream CDC
consumers (cdc.apply_cdc) take either source.  Semantics are NET: a row
inserted then deleted between the versions appears in neither snapshot
and so produces nothing — exactly the collapse a snapshot diff means.

Scale shape: one full-outer join of the two snapshots on the key
columns, comparing non-key payloads via md5 of a canonical struct (one
fixed-width comparison regardless of row width, computed map-side on
both sides).  Each snapshot read carries its own data skipping; the join
is the only shuffle.  Reference surface: delta-rs exposes snapshot reads
(``DeltaTable(path, version=...)``) but no diff; real Delta gets this
from CDF only when it was enabled before the fact.

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .delta import read_table


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Row-level diff of two arbitrary DataFrames sharing a schema.

    Returns old/new columns unioned with ``_change_type`` ∈ insert /
    delete / update_preimage / update_postimage; unchanged rows (payload
    md5 equal) drop out before the union so the output is only churn.
    NULL-safe on keys (a NULL key row diffs like any other value — this
    is an audit tool, it must not silently skip rows real tables contain).
    """
    if not keys:
        raise ValueError("snapshot_diff requires at least one key column")
    missing = [k for k in keys if k not in old.columns or k not in new.columns]
    if missing:
        raise ValueError(f"key columns missing from inputs: {missing}")
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schemas differ: {sorted(set(old.columns) ^ set(new.columns))}"
        )
    payload = [c for c in old.columns if c not in keys]

    def digest(df: DataFrame, tag: str) -> DataFrame:
        h = (
            F.md5(F.to_json(F.struct(*[F.col(c) for c in payload])))
            if payload
            else F.lit("")
        )
        return df.select(
            *[F.col(k) for k in keys],
            F.struct(*[F.col(c) for c in df.columns]).alias(f"__row_{tag}"),
            h.alias(f"__h_{tag}"),
        )

    o, n = digest(old, "o"), digest(new, "n")
    cond = None
    for k in keys:
        c = o[k].eqNullSafe(n[k])
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("__h_o").isNotNull()
    in_new = F.col("__h_n").isNotNull()
    changed = in_old & in_new & (F.col("__h_o") != F.col("__h_n"))

    def emit(row_col: str, ctype: str, pred) -> DataFrame:
        return (
            joined.filter(pred)
            .select(F.col(row_col).alias("r"))
            .select("r.*", F.lit(ctype).alias("_change_type"))
        )

    return (
        emit("__row_n", "insert", in_new & ~in_old)
        .unionByName(emit("__row_o", "delete", in_old & ~in_new))
        .unionByName(emit("__row_o", "update_preimage", changed))
        .unionByName(emit("__row_n", "update_postimage", changed))
    )


def table_diff(
    spark: SparkSession,
    path: str,
    *,
    keys: Sequence[str],
    from_version: int,
    to_version: int,
) -> DataFrame:
    """snapshot_diff between two TIME-TRAVELED versions of a Delta table
    (jar-less fallback or native — whatever read_table resolves)."""
    if from_version >= to_version:
        raise ValueError(
            f"from_version {from_version} must precede to_version {to_version}"
        )
    return snapshot_diff(
        read_table(spark, path, version=from_version),
        read_table(spark, path, version=to_version),
        keys,
    )
