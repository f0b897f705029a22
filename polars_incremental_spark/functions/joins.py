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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join with the full reference surface (polars
    ``join_asof`` strategies — reference ``src/polars_incremental``'s host
    API): ``direction='backward'`` matches the latest right row at-or-before
    each left row, ``'forward'`` the earliest at-or-after, ``'nearest'``
    whichever of the two is closer in time (ties → backward, polars' rule).
    ``tolerance`` (an SQL interval string, e.g. ``"10 minutes"``) drops
    matches farther than that from the left timestamp.

    Right payload columns come back suffixed; the matched right timestamp is
    ``<right_ts><suffix>``.  Left rows with no qualifying right row keep
    nulls (left-join semantics).  Ties (equal timestamps) match inclusively.

    Right rows that share (keys, ts) should be pre-deduplicated (e.g. with
    ``patterns.latest_per_key``) — which of them wins is otherwise
    unspecified, exactly as in DuckDB/pandas ASOF implementations.

    Plan shape (all directions): union + running last/first over a window —
    NO join operator at all, each row touched once, so a skewed key costs
    O(rows) not O(rows²); 'nearest' evaluates both frames over the SAME
    sort order (one exchange, two window functions).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest'; got {direction!r}"
        )
    on = list(on)
    payload = [c for c in right.columns if c not in on and c != right_ts]
    # The whole right row travels as ONE struct: last/first(ignorenulls)
    # over the struct picks one right ROW, never back-filling an individual
    # NULL payload field from another row (which would silently mix rows).
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

    # Inclusive tie handling needs the same-ts right row INSIDE the frame:
    # backward orders right rows BEFORE left at equal ts (frame ends at the
    # current row), forward orders them AFTER (frame starts at it).  Both
    # windows share the partitioning, so 'nearest' still costs ONE exchange.
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    if direction in ("backward", "nearest"):
        merged = merged.withColumn(
            "__back", F.last(F.col("__rrow"), ignorenulls=True).over(w_back)
        )
    if direction in ("forward", "nearest"):
        merged = merged.withColumn(
            "__fwd", F.first(F.col("__rrow"), ignorenulls=True).over(w_fwd)
        )

    out = merged.filter(F.col("__is_right") == 0)
    ts_field = f"{right_ts}{suffix}"

    def _within(struct_col):
        if tolerance is None:
            return struct_col
        # Compare timestamps directly: [left_ts - tol, left_ts + tol].
        # Converting the interval to micros via an epoch LITERAL parses
        # '1970-01-01' in the SESSION timezone (silently shifting the
        # tolerance by the UTC offset in non-UTC sessions), and calendar
        # intervals like '1 month' would resolve to January's length.
        # Anchoring at left_ts is TZ-independent and gives calendar
        # intervals their natural per-row meaning.  Backward matches
        # already satisfy m_ts <= left_ts (only the lower bound binds);
        # forward the upper — one symmetric predicate covers both.
        m_ts = struct_col.getField(ts_field)
        tol = F.expr(f"INTERVAL {tolerance}")
        in_range = (m_ts >= F.col(left_ts) - tol) & (m_ts <= F.col(left_ts) + tol)
        return F.when(in_range, struct_col)

    if direction == "backward":
        chosen = _within(F.col("__back"))
    elif direction == "forward":
        chosen = _within(F.col("__fwd"))
    else:
        back, fwd = _within(F.col("__back")), _within(F.col("__fwd"))
        back_gap = F.abs(
            F.unix_micros(F.col(left_ts)) - F.unix_micros(back.getField(ts_field))
        )
        fwd_gap = F.abs(
            F.unix_micros(F.col(left_ts)) - F.unix_micros(fwd.getField(ts_field))
        )
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(fwd_gap < back_gap, fwd)
            .otherwise(back)  # ties -> backward
        )
    out = out.withColumn("__chosen", chosen)
    carried = [ts_field, *[f"{c}{suffix}" for c in payload]]
    for c in carried:
        out = out.withColumn(c, F.col("__chosen").getField(c))
    return out.drop("__chosen", "__back", "__fwd", "__is_right", "__ts")


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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str] = (),
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket: str = "INTERVAL 1 HOUR",
    suffix: str = "_r",
) -> DataFrame:
    """Interval × interval overlap join: pairs where
    ``[left_start, left_end)`` intersects ``[right_start, right_end)``
    (half-open — touching endpoints do NOT overlap), optionally per key.

    A raw inequality join (``l.start < r.end AND r.start < l.end``) plans
    as a nested loop — O(|L|·|R|) per key.  The scale shape instead tiles
    time into fixed ``bucket``-width cells, explodes EACH side to the cells
    its interval covers, and equi-joins on (keys, cell).  An overlapping
    pair collides in every shared cell, so to avoid a dedup shuffle the
    join keeps only the CANONICAL cell — the one containing
    ``greatest(l.start, r.start)``, which both intervals cover by
    definition of overlap — making each qualifying pair survive exactly
    once with no ``distinct``.

    Cost: each row lands in O(interval_len / bucket) cells; pick ``bucket``
    near the typical interval length so that factor stays O(1).  Join cost
    is then O(pairs-that-share-a-cell), not O(|L|·|R|).
    """
    on = list(on)
    width_us = F.expr(
        f"unix_micros(timestamp'1970-01-01' + {bucket}) - unix_micros(timestamp'1970-01-01')"
    )

    def _cells(df: DataFrame, start: str, end: str, rename: bool) -> DataFrame:
        b0 = F.floor(F.unix_micros(F.col(start)) / width_us)
        # half-open end: an interval ending exactly on a cell edge does not
        # enter the next cell
        b1 = F.floor(
            (F.unix_micros(F.col(end)) - F.lit(1)) / width_us
        )
        payload = [c for c in df.columns if c not in on]
        cols = [
            F.col(c).alias(f"{c}{suffix}") if rename else F.col(c)
            for c in payload
        ]
        return df.select(
            *on, *cols, F.explode(F.sequence(b0, F.greatest(b0, b1))).alias("__cell")
        )

    l = _cells(left, left_start, left_end, rename=False)
    r = _cells(right, right_start, right_end, rename=True)
    rs, re_ = f"{right_start}{suffix}", f"{right_end}{suffix}"
    joined = l.join(r, [*on, "__cell"])
    return joined.filter(
        (F.col(left_start) < F.col(re_))
        & (F.col(rs) < F.col(left_end))
        # canonical cell: the one holding the later of the two starts —
        # covered by both intervals whenever they overlap, so exactly one
        # copy of each pair survives
        & (
            F.col("__cell")
            == F.floor(
                F.unix_micros(F.greatest(F.col(left_start), F.col(rs))) / width_us
            )
        )
    ).drop("__cell")
