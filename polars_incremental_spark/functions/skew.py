"""Skew-mitigation helpers for hot-key joins and per-key top-k at scale.

AQE's skew-join splitting (on in session.py) handles moderately skewed
SORT-MERGE joins automatically, but it cannot split a single hot key's
build-side rows across tasks when the semantics need every (hot-key row ×
match) pair.  Salting does: the big side gets a per-row salt, the small
side is replicated once per salt value, and the join key becomes
(key, salt) — a single hot key now spreads over ``n_salts`` tasks.

Plain ``groupBy`` aggregation does NOT need salting in Spark: partial
(map-side) aggregation already combines per-partition before the shuffle.
``two_phase_agg`` pays exactly where no map-side combine exists — custom
Python aggregations (``groupBy().applyInPandas``), which otherwise ship
every hot-key row into ONE Arrow batch in one worker.  It does NOT pay
for conserved state like ``collect_list``: the lists survive every merge
intact, so the hot key's full volume funnels into one phase-2 task
regardless and the salt layer only adds a shuffle.

Measured (tools/skew_bench.py, 100M rows, one key = 10% of rows, 256
reduce tasks): salted_join cuts the join straggler 5539 -> 1569 ms
(max/median 13.4x -> 2.9x) for +27% shuffle; a pandas UDAF goes 28.8x ->
2.4x straggler and 2.1x wall via two-phase; collect_list via two-phase is
5x SLOWER — see PLANS.md round-8 for the full table.  Default AQE did not
split the hot partition (160 MB < its 256 MB threshold): AQE skew-split
is a threshold-gated rescue, salting is deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Attach a uniform per-row salt in [0, n_salts).

    Derived from ``monotonically_increasing_id`` (cheap, no shuffle) — rows
    of a hot key land in different salt buckets regardless of key skew.
    """
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )


def replicate_for_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Replicate every row once per salt value (the small side of a salted join)."""
    return df.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``large`` has skewed keys: join on (keys + salt).

    ``small`` is replicated ``n_salts``× (keep it genuinely small or
    broadcastable); the hot key's rows spread across ``n_salts`` tasks
    instead of stalling one. Result equals ``large.join(small, on, how)``
    for the supported join types.

    Only large-side-preserving joins are supported (inner / left /
    left_outer / semi / anti): for right or full-outer joins an unmatched
    ``small`` row would surface once PER SALT (it was replicated), so the
    result would NOT equal the unsalted join — such ``how`` values raise.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports only large-side-preserving joins {sorted(allowed)}; "
            f"got how={how!r} — a right/full outer join would replicate unmatched "
            f"small-side rows {n_salts}x"
        )
    salt = "__salt"
    left = with_salt(large, n_salts, salt)
    right = replicate_for_salt(small, n_salts, salt)
    return left.join(right, [*on, salt], how).drop(salt)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    first_phase: list[Column],
    second_phase: list[Column],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for high-cardinality-state aggs.

    Phase 1 groups by (keys + salt) with ``first_phase`` expressions; phase
    2 re-groups by keys with ``second_phase`` merging the partials, e.g.::

        two_phase_agg(df, ["k"],
                      [F.collect_list("v").alias("vs")],
                      [F.flatten(F.collect_list("vs")).alias("vs")])
    """
    salt = "__salt"
    partial = with_salt(df, n_salts, salt).groupBy(*keys, salt).agg(*first_phase)
    return partial.groupBy(*keys).agg(*second_phase)


def two_phase_apply_in_pandas(
    df: DataFrame,
    keys: Sequence[str],
    partial_fn,
    partial_schema: str,
    merge_exprs: list[Column],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase CUSTOM Python aggregation — the case the measured
    table in the module docstring shows two-phase actually wins (28.8x ->
    2.4x straggler, 2.1x wall on the skew fixture): ``applyInPandas`` has
    NO map-side combine, so a plain ``groupBy(keys).applyInPandas`` ships
    every hot-key row into ONE Arrow batch in one python worker.

    Phase 1 runs ``partial_fn`` (a pandas groupBy-apply function) over
    (keys + ``__salt``) groups — the hot key's rows spread over
    ``n_salts`` parallel workers; the frame ``partial_fn`` receives
    includes the ``__salt`` column and its output must match
    ``partial_schema`` (which must carry the key columns).  Phase 2
    merges the tiny partials JVM-side with ``merge_exprs``::

        def moments(pdf):
            return pd.DataFrame({"k": [pdf.k.iloc[0]], "n": [len(pdf)],
                                 "s": [pdf.v.sum()]})
        two_phase_apply_in_pandas(
            df, ["k"], moments, "k long, n long, s double",
            [F.sum("n").alias("n"), F.sum("s").alias("s")])

    Only valid for DECOMPOSABLE aggregations (the merge of partials must
    equal the one-shot result) — medians, mode, order-dependent logic
    need a mergeable-sketch formulation first.
    """
    salt = "__salt"
    partial = (
        with_salt(df, n_salts, salt)
        .groupBy(*keys, salt)
        .applyInPandas(partial_fn, partial_schema)
    )
    return partial.groupBy(*keys).agg(*merge_exprs)


def detect_hot_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    top_n: int = 20,
    min_share: float = 0.0,
) -> DataFrame:
    """Key-skew diagnostic: the ``top_n`` heaviest join/group keys with
    their row counts and share of the total — the number that predicts
    whether a shuffle on these keys needs salting BEFORE the 6-hour stage
    reveals it.

    Rule of thumb encoded in ``min_share``: a key holding more than
    ~1/tasks of the rows serializes its task; at 1000 tasks flag 0.1%+.
    One aggregation (map-side combined) + a broadcast-size top-n sort —
    safe to run on the full corpus.

    Output: (key..., n_rows, share, rank).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    order = [F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols]]
    top = (
        counts.join(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("__total"), 6))
        .filter(F.col("share") >= min_share)
        # orderBy+limit compiles to TakeOrderedAndProject — a distributed
        # top-k, NOT a global sort of the (possibly huge) distinct-key table
        .orderBy(*order)
        .limit(top_n)
    )
    # rank window runs over <= top_n rows, so its single partition is fine
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    ).drop("__total")
