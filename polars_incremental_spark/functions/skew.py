"""Skew-mitigation helpers for hot-key joins and per-key top-k at scale.

AQE's skew-join splitting (on in session.py) handles moderately skewed
SORT-MERGE joins automatically, but it cannot split a single hot key's
build-side rows across tasks when the semantics need every (hot-key row ×
match) pair.  Salting does: the big side gets a per-row salt, the small
side is replicated once per salt value, and the join key becomes
(key, salt) — a single hot key now spreads over ``n_salts`` tasks.

Plain ``groupBy`` aggregation does NOT need salting in Spark: partial
(map-side) aggregation already combines per-partition before the shuffle.
Salting aggregation is only worth it for high-cardinality-state aggs like
``collect_list`` — use ``two_phase_agg`` for those.
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
