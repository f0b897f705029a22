"""As-of (nearest-prior) joins — beyond reference parity (SURVEY §2.6 notes
the reference lacks them; Spark expresses them without UDFs).

``asof_join`` matches each left row with the LATEST right row whose
timestamp is <= the left timestamp (backward direction, inclusive), per
key group — the canonical "state at event time" join of event analytics.

Implementation is the union + running-last trick, entirely in Catalyst:

1. tag and union both sides on (keys, ts),
2. one window per key ordered by (ts, right-first-on-ties) carries the
   right side's columns forward with ``last(ignorenulls)``,
3. keep only left rows.

One shuffle on the keys — the same exchange a sort-merge join would pay,
with no range-condition blowup: each row is touched once, so a skewed key
costs O(rows), not O(rows²) as an inequality-join would.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at-or-before it.

    Right payload columns come back suffixed; the matched right timestamp is
    ``<right_ts><suffix>``.  Left rows with no prior right row keep nulls
    (left-join semantics).  Ties (equal timestamps) match inclusively.

    Right rows that share (keys, ts) should be pre-deduplicated (e.g. with
    ``patterns.latest_per_key``) — which of them wins is otherwise
    unspecified, exactly as in DuckDB/pandas ASOF implementations.
    """
    on = list(on)
    payload = [c for c in right.columns if c not in on and c != right_ts]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_right", F.lit(0))
    merged = l.unionByName(r, allowMissingColumns=True)

    # right rows sort BEFORE left rows at equal ts → inclusive (<=) matches
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [f"{right_ts}{suffix}", *[f"{c}{suffix}" for c in payload]]
    for c in carried:
        merged = merged.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return merged.filter(F.col("__is_right") == 0).drop("__is_right", "__ts")
