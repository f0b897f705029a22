"""Data-quality profiling: one declarative pass over a table yielding a
long-format (column, metric, value) report — the deequ-style health check
a pipeline runs before publishing a batch.

Scale shape: a single agg computes every per-column metric (null counts,
exact distinct counts, min/max lengths).  Catalyst plans the
multi-distinct via EXPAND, which replicates each scanned row once per
distinct aggregate — so profiling N columns costs ~N row-copies through
the first shuffle.  Fine for routine health checks; for a very wide
table at full scale, profile in column batches or swap the exact
distincts for approx_count_distinct.  The wide->long reshape is a
map-side stack() — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def data_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) into rows of
    (column, metric, value) with value as a long:

    - ``n_rows``  — table cardinality (reported per column for a flat shape)
    - ``n_nulls`` — null count
    - ``n_distinct`` — EXACT distinct count (nulls excluded)
    - ``min_len`` / ``max_len`` — string length bounds (string columns; 0
      when the column is all-null)

    Exact integers end-to-end, so the report hash-matches any engine.
    """
    cols = df.columns if columns is None else list(columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__dist_{c}"))
    string_cols = [c for c, t in df.dtypes if c in cols and t == "string"]
    for c in string_cols:
        aggs.append(
            F.coalesce(F.min(F.length(F.col(c))), F.lit(0))
            .cast("long")
            .alias(f"__minlen_{c}")
        )
        aggs.append(
            F.coalesce(F.max(F.length(F.col(c))), F.lit(0))
            .cast("long")
            .alias(f"__maxlen_{c}")
        )
    wide = df.agg(*aggs)
    stack_terms = []
    for c in cols:
        stack_terms.append(f"'{c}', 'n_rows', __n")
        stack_terms.append(f"'{c}', 'n_nulls', __nulls_{c}")
        stack_terms.append(f"'{c}', 'n_distinct', __dist_{c}")
        if c in string_cols:
            stack_terms.append(f"'{c}', 'min_len', __minlen_{c}")
            stack_terms.append(f"'{c}', 'max_len', __maxlen_{c}")
    n = len(stack_terms)
    return wide.select(
        F.expr(
            f"stack({n}, {', '.join(stack_terms)}) AS (column_name, metric, value)"
        )
    ).orderBy("column_name", "metric")
