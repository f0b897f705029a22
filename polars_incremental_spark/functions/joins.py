"""As-of (nearest-prior) joins — beyond reference parity (SURVEY §2.6 notes
the reference lacks them; Spark expresses them without UDFs).

``asof_join`` matches each left row with the LATEST right row whose
timestamp is <= the left timestamp (backward direction, inclusive), per
key group — the canonical "state at event time" join of event analytics.

Implementation is the union + running-last trick, entirely in Catalyst:

1. tag and union both sides on (keys, ts),
2. one window per key ordered by (ts, right-first-on-ties) carries the
   right side's row forward as a SINGLE struct with ``last(ignorenulls)``
   (one struct, not per-column, so every carried value comes from the same
   matched right row even when that row has NULL payload fields),
3. keep only left rows and unpack the struct.

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
    # The whole right row travels as ONE struct: last(ignorenulls) over the
    # struct picks the latest right ROW, never back-filling an individual
    # NULL payload field from an older row (which would silently mix rows).
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.struct(
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        ).alias("__rrow"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_right", F.lit(0))
    merged = l.unionByName(r, allowMissingColumns=True)

    # right rows sort BEFORE left rows at equal ts → inclusive (<=) matches
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = merged.withColumn("__rrow", F.last(F.col("__rrow"), ignorenulls=True).over(w))
    out = merged.filter(F.col("__is_right") == 0)
    carried = [f"{right_ts}{suffix}", *[f"{c}{suffix}" for c in payload]]
    for c in carried:
        out = out.withColumn(c, F.col("__rrow").getField(c))
    return out.drop("__rrow", "__is_right", "__ts")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 10 MINUTES",
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: pairs where right_ts ∈ [left_ts − upper, left_ts − lower].

    A naive inequality join degenerates to a per-key cross product (Spark
    plans it as a nested-loop).  This is the standard scale shape instead:
    both sides get a coarse time bucket of width (upper − lower... the span),
    the LEFT side explodes to the 2 candidate buckets its window can touch,
    and the join becomes an EQUI-join on (keys, bucket) + an exact range
    filter — each row lands in O(1) buckets, so cost is O(matches), not
    O(|left|·|right|) per key.
    """
    on = list(on)
    # bucket width = span of the match window, in microseconds
    width_us = F.expr(
        f"unix_micros(timestamp'1970-01-01' + {upper}) - unix_micros(timestamp'1970-01-01' + {lower})"
    )
    payload = [c for c in right.columns if c not in on]
    r = right.select(
        *on,
        F.floor(F.unix_micros(F.col(right_ts)) / width_us).alias("__bucket"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    l = left.withColumn(
        "__b0", F.floor((F.unix_micros(F.col(left_ts)) - F.expr(f"unix_micros(timestamp'1970-01-01' + {upper})")) / width_us)
    ).withColumn(
        "__b1", F.floor((F.unix_micros(F.col(left_ts)) - F.expr(f"unix_micros(timestamp'1970-01-01' + {lower})")) / width_us)
    )
    l = l.withColumn(
        "__bucket", F.explode(F.sequence(F.col("__b0"), F.col("__b1")))
    ).drop("__b0", "__b1")
    joined = l.join(r, [*on, "__bucket"]).drop("__bucket")
    return joined.filter(
        (F.col(f"{right_ts}{suffix}") >= F.col(left_ts) - F.expr(upper))
        & (F.col(f"{right_ts}{suffix}") <= F.col(left_ts) - F.expr(lower))
    )
