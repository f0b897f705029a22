"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in streaming aggregations can't express (running
totals emitted per batch, cross-batch seen-key dedupe with explicit state),
Spark's arbitrary-state API is the sanctioned tool: state lives in the
executor-side state store (checkpointed, recoverable), per-key groups are
processed as Arrow batches, and timeouts expire idle keys.

Scale notes: state is partitioned by the grouping key across executors;
the only shuffle is the groupBy hash exchange.  Set watermarks + timeouts
so state is bounded — unbounded key spaces need ``GroupStateTimeout``
expiry or the state store grows forever.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def running_totals(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Cumulative (count, sum) per key across ALL micro-batches seen so far.

    Emits one row per key per batch with the running totals — the streaming
    analog of the reference's JobState rolling-aggregate pattern
    (examples/advanced-patterns/incremental_aggregations.py:47-77), with
    state in Spark's checkpointed state store instead of a JSON blob.
    """
    key_fields = [df.schema[k] for k in keys]
    out_schema = T.StructType(
        [*key_fields,
         T.StructField("n", T.LongType()),
         T.StructField("total", T.DoubleType())]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame([{**dict(zip(keys, key)), "n": n, "total": total}])

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def seen_key_filter(
    df: DataFrame,
    keys: Sequence[str],
    *,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Emit only rows whose key was never seen in any earlier batch (W4 as a
    native stateful operator: exactly-once per key across the stream)."""
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    col_order = df.columns

    def update(key, pdfs, state):
        first_batch_rows = []
        if not state.exists:
            for pdf in pdfs:
                if first_batch_rows:
                    break
                if len(pdf):
                    first_batch_rows.append(pdf.iloc[:1])
            state.update((True,))
            if first_batch_rows:
                yield first_batch_rows[0][col_order]
        else:
            for _ in pdfs:  # drain the iterator; key already seen
                pass

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )
