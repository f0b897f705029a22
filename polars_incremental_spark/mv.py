"""Incremental materialized-view maintenance over the jar-less Delta path.

A grouped sum/count aggregate MV refreshes from the base table's CHANGE
DATA FEED instead of recomputing: each change row carries a sign (+1 for
insert/update_postimage, -1 for delete/update_preimage), the signed deltas
group-reduce to one small frame, and a three-clause MERGE folds them into
the MV — update existing groups, insert new ones, delete groups whose
count reaches zero.  Sum and count are the classically self-maintainable
aggregates (avg derives as sum/count); min/max are monotone under inserts
only, so requesting them commits the MV to an append-only feed — a
delete/update change row fails the refresh closed rather than silently
keeping a retracted extremum.

Crash safety: the base-table watermark travels as DOMAIN METADATA inside
the refresh commit itself — state and data advance in ONE atomic commit,
so a crash anywhere leaves the MV at its previous consistent (version,
watermark) pair and the next refresh re-derives the same deltas.  Domain
metadata (unlike commitInfo) is carried by parquet log checkpoints, so the
state survives ``checkpoint_log`` + ``expire_log`` on the MV's own log;
each commit also mirrors the state into ``commitInfo.userMetadata`` for
human-readable provenance in DESCRIBE HISTORY.

Scale shape: refresh cost tracks the CHANGE volume, not the base size —
one parquet scan over the changed files, one group-reduce shuffle sized by
touched groups, and a file-selective MERGE that rewrites only the MV files
containing touched groups.  At 100 TB base with a bounded change rate this
is the difference between minutes and a full recompute.

Reference parity: the reference has no MV layer; this composes the same
public Delta CDF semantics delta-spark's ``table_changes`` exposes.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoints.delta import DeltaLog
from .sinks.deltalog import (
    merge_into,
    read_change_feed,
    read_delta_fallback,
    write_delta_fallback,
)

_MV_DOMAIN = "pis.mv"
_JOIN_DOMAIN = "pis.joinMv"


def _sign():
    # built lazily: Columns need an active SparkContext
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))


def _mv_state(mv_path: str, domain: str) -> dict[str, Any]:
    """Latest MV spec+watermark from the MV log's ``domain`` metadata —
    checkpoint-carried, so it survives log expiry (the checkpoint-seeded
    replay lives in ``DeltaLog.domain_metadata``)."""
    log = DeltaLog(mv_path)
    if log.latest_version() is None:
        raise FileNotFoundError(f"not a delta table: {mv_path}")
    raw = log.domain_metadata().get(domain)
    if raw is None:
        raise ValueError(
            f"{mv_path} carries no {domain} domain metadata; was it created "
            "by create_agg_mv / create_join_mv?"
        )
    return json.loads(raw)


def _head_version(path: str) -> int:
    head = DeltaLog(path).latest_version()
    if head is None:
        raise FileNotFoundError(f"not a delta table: {path}")
    return head


def _check_no_null_keys(df: DataFrame, group_cols: list[str], where: str) -> None:
    cond = None
    for c in group_cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    if not df.filter(cond).isEmpty():
        raise ValueError(
            f"NULL group key in {where}: Delta MERGE keys are null-unsafe "
            "(NULL never matches), so a null-keyed group would duplicate on "
            "every refresh — filter or coalesce the key upstream"
        )


def _aggs(
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str,
    signed: bool,
    min_cols: list[str] = (),
    max_cols: list[str] = (),
):
    sign = _sign() if signed else F.lit(1)
    out = [F.sum(sign).cast("long").alias(count_col)]
    for c in sum_cols:
        out.append(F.sum(sign * F.col(c)).alias(f"sum_{c}"))
    # min/max are monotone under INSERTS (the refresh path enforces an
    # insert-only feed when they're present), so plain min/max per group
    # is the correct delta regardless of the sign machinery
    for c in min_cols:
        out.append(F.min(c).alias(f"min_{c}"))
    for c in max_cols:
        out.append(F.max(c).alias(f"max_{c}"))
    return out


def create_agg_mv(
    spark: SparkSession,
    base_path: str,
    mv_path: str,
    *,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    count_col: str = "cnt",
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> dict[str, Any]:
    """Materialize ``SELECT group_cols, count(*), sum(c)..., min(c)...,
    max(c)... GROUP BY`` from the base table's CURRENT snapshot and record
    the snapshot version as the refresh watermark.  ``min_cols``/
    ``max_cols`` commit the MV to an INSERT-ONLY feed: min/max are
    monotone under inserts but not reversible under deletes, so a later
    refresh fails closed on any delete/update change row.  Returns
    {base_version, rows}."""
    sum_cols = list(sum_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    base_version = DeltaLog(base_path).latest_version()
    if base_version is None:
        raise FileNotFoundError(f"not a delta table: {base_path}")
    # pin the scan to the recorded version: a concurrent append between
    # "read the head" and "scan" would otherwise leak rows past the
    # watermark and the next refresh would double-count them
    base = read_delta_fallback(spark, base_path, version=base_version)
    _check_no_null_keys(base.select(*group_cols), group_cols, "base table")
    mv = base.groupBy(*group_cols).agg(
        *_aggs(group_cols, sum_cols, count_col, False, min_cols, max_cols)
    ).persist()  # feeds both the write and the returned count
    state = {
        "base_path": base_path,
        "base_version": base_version,
        "group_cols": group_cols,
        "sum_cols": sum_cols,
        "count_col": count_col,
        "min_cols": min_cols,
        "max_cols": max_cols,
    }
    blob = json.dumps(state)
    write_delta_fallback(
        mv,
        mv_path,
        mode="overwrite",
        user_metadata=blob,
        domain_metadata={_MV_DOMAIN: blob},
    )
    rows = mv.count()
    mv.unpersist()
    return {"base_version": base_version, "rows": rows}


def _assert_inserts_only(cdf: DataFrame, which: str, remedy: str) -> None:
    bad = cdf.filter(F.col("_change_type") != "insert").limit(1).collect()
    if bad:
        raise NotImplementedError(
            f"{which} maintenance is append-only; its change feed carries "
            f"a {bad[0]['_change_type']!r} — {remedy}"
        )


def create_join_mv(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    mv_path: str,
    *,
    on: list[str],
) -> dict[str, Any]:
    """Materialize the inner equi-join of two Delta tables and record BOTH
    snapshot versions as the refresh watermark.  Non-key column names must
    be disjoint (the MV is one flat schema).  Returns {left_version,
    right_version, rows}."""
    lv = DeltaLog(left_path).latest_version()
    rv = DeltaLog(right_path).latest_version()
    if lv is None or rv is None:
        raise FileNotFoundError("both join-MV bases must be delta tables")
    left = read_delta_fallback(spark, left_path, version=lv)
    right = read_delta_fallback(spark, right_path, version=rv)
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            f"non-key columns {sorted(clash)} exist on both sides; rename "
            "upstream — the MV schema is flat"
        )
    mv = left.join(right, on).persist()
    state = {
        "left_path": left_path,
        "right_path": right_path,
        "left_version": lv,
        "right_version": rv,
        "on": on,
    }
    blob = json.dumps(state)
    write_delta_fallback(
        mv,
        mv_path,
        mode="overwrite",
        user_metadata=blob,
        domain_metadata={_JOIN_DOMAIN: blob},
    )
    rows = mv.count()
    mv.unpersist()
    return {"left_version": lv, "right_version": rv, "rows": rows}


def refresh_join_mv(spark: SparkSession, mv_path: str) -> dict[str, Any]:
    """Fold both bases' appends into the join MV with the classic
    delta-join decomposition — (L₁+ΔL)⋈(R₁+ΔR) = L₁⋈R₁ ∪ ΔL⋈R₂ ∪ L₁⋈ΔR,
    where ΔL joins the NEW right snapshot (covering ΔL⋈ΔR once) and ΔR
    joins the OLD left snapshot.  Both delta terms are change-sized on one
    side, so at 100 TB the refresh scans the deltas plus ONE stats-prunable
    pass over each base — never base×base.  Appends land in ONE commit
    carrying the advanced (left_version, right_version) watermark, so a
    crash anywhere is a clean no-op.  Append-only bases; a delete/update
    in either feed fails closed (multiplicity-counted IVM not implemented).
    """
    state = _mv_state(mv_path, _JOIN_DOMAIN)
    on = list(state["on"])
    lv, rv = int(state["left_version"]), int(state["right_version"])
    lhead = _head_version(state["left_path"])
    rhead = _head_version(state["right_path"])
    if lhead <= lv and rhead <= rv:
        return {"refreshed": False, "rows_added": 0}
    parts = []
    if lhead > lv:
        dl = read_change_feed(
            spark, state["left_path"], starting_version=lv + 1, ending_version=lhead
        )
        _assert_inserts_only(
            dl,
            "join-MV (left base)",
            "deletes/updates need multiplicity-counted IVM (not implemented)",
        )
        dl = dl.drop("_change_type", "_commit_version", "_commit_timestamp")
        r_new = read_delta_fallback(spark, state["right_path"], version=rhead)
        parts.append(dl.join(r_new, on))
    if rhead > rv:
        dr = read_change_feed(
            spark, state["right_path"], starting_version=rv + 1, ending_version=rhead
        )
        _assert_inserts_only(
            dr,
            "join-MV (right base)",
            "deletes/updates need multiplicity-counted IVM (not implemented)",
        )
        dr = dr.drop("_change_type", "_commit_version", "_commit_timestamp")
        l_old = read_delta_fallback(spark, state["left_path"], version=lv)
        parts.append(l_old.join(dr, on))
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p)
    delta = delta.persist()  # feeds the count and the staged write
    new_state = {**state, "left_version": lhead, "right_version": rhead}
    blob = json.dumps(new_state)
    rows = delta.count()
    write_delta_fallback(
        delta,
        mv_path,
        mode="append",
        user_metadata=blob,
        domain_metadata={_JOIN_DOMAIN: blob},
    )
    delta.unpersist()
    return {"refreshed": True, "rows_added": rows}


def refresh_agg_mv(
    spark: SparkSession, base_path: str, mv_path: str
) -> dict[str, Any]:
    """Fold the base table's change feed since the MV's watermark into the
    MV with one atomic MERGE.  Returns {refreshed, from_version,
    to_version, groups_touched}."""
    state = _mv_state(mv_path, _MV_DOMAIN)
    group_cols = list(state["group_cols"])
    sum_cols = list(state["sum_cols"])
    count_col = state["count_col"]
    min_cols = list(state.get("min_cols") or [])
    max_cols = list(state.get("max_cols") or [])
    last = int(state["base_version"])
    head = _head_version(base_path)
    if head <= last:
        return {
            "refreshed": False,
            "from_version": last,
            "to_version": head,
            "groups_touched": 0,
        }
    cdf = read_change_feed(
        spark, base_path, starting_version=last + 1, ending_version=head
    )
    if min_cols or max_cols:
        # min/max are monotone under inserts only — a delete could retract
        # the current extremum and the MV has no second-best state
        _assert_inserts_only(
            cdf,
            "min/max aggregate MV",
            "retracting an extremum needs full per-group state; drop "
            "min_cols/max_cols or recreate the MV",
        )
    sum_aliases = [f"sum_{c}" for c in sum_cols]
    delta = (
        cdf.groupBy(*group_cols)
        .agg(*_aggs(group_cols, sum_cols, count_col, True, min_cols, max_cols))
        # net-zero groups (equal insert/delete churn) would MERGE-rewrite
        # their MV files for nothing — drop them before the join.  With
        # min/max present the feed is insert-only, so every delta group
        # has cnt > 0 and the filter passes it through untouched.
        .filter(
            " or ".join(
                [f"{count_col} != 0"]
                + [f"coalesce(sum_{c}, 0) != 0" for c in sum_cols]
            )
        )
    )
    # persist: the small delta feeds the null-key probe, the count, and
    # every pass merge_into makes (dup-check, hit files, join, insert) —
    # uncached, each would re-run the full change-feed scan + shuffle
    delta = delta.persist()
    _check_no_null_keys(delta.select(*group_cols), group_cols, "change feed")
    new_state = {**state, "base_version": head}
    blob = json.dumps(new_state)
    touched = delta.count()
    if touched == 0:
        # nothing to fold; advance the watermark with a zero-row append so
        # the walked range never re-reads (still one atomic commit)
        delta.unpersist()
        write_delta_fallback(
            spark.createDataFrame(
                [], read_delta_fallback(spark, mv_path).schema
            ),
            mv_path,
            mode="append",
            user_metadata=blob,
            domain_metadata={_MV_DOMAIN: blob},
        )
        return {
            "refreshed": True,
            "from_version": last + 1,
            "to_version": head,
            "groups_touched": 0,
        }
    update_exprs = {count_col: f"{count_col} + src.{count_col}"}
    for a in sum_aliases:
        # sums are null until the first non-null value flows through
        update_exprs[a] = f"coalesce({a}, 0) + coalesce(src.{a}, 0)"
    for c in min_cols:
        # Spark least/greatest skip nulls (null only when all args null),
        # exactly the all-null-so-far MV semantics
        update_exprs[f"min_{c}"] = f"least(min_{c}, src.min_{c})"
    for c in max_cols:
        update_exprs[f"max_{c}"] = f"greatest(max_{c}, src.max_{c})"
    merge_into(
        spark,
        mv_path,
        delta,
        keys=group_cols,
        when_matched_delete=f"{count_col} + src.{count_col} = 0",
        when_matched_update=update_exprs,
        when_not_matched_insert=True,
        user_metadata=blob,
        domain_metadata={_MV_DOMAIN: blob},
    )
    delta.unpersist()
    return {
        "refreshed": True,
        "from_version": last + 1,
        "to_version": head,
        "groups_touched": touched,
    }
