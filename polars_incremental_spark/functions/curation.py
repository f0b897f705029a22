"""Corpus curation operators: per-group selection at skewed-cardinality scale.

A "top-k documents per language" window is the canonical curation step — and
the canonical skew trap: a corpus groups into a handful of languages, so
``Window.partitionBy(lang)`` funnels ~all 100 TB through ~10 reducer keys.
``grouped_topk`` is the two-phase fix: a salted local top-k bounds any one
reducer's input at N/n_salts, then a final top-k merges k×n_salts rows per
group.  The result is provably identical to the single-window form (every
global top-k row survives its salt cell's local top-k), so SQL oracles can
keep using the plain window formulation.

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    *,
    salt_col: str,
    n_salts: int = 64,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group, skew-safe.

    ``order_by`` is the full ordering (include a unique tie-break, e.g.
    ``[F.col("quality").desc(), F.col("doc_id").asc()]``) — required for a
    deterministic result.  ``salt_col`` is any column whose hash spreads
    rows (a unique id); the salt never affects the output, only the
    shuffle's key cardinality.  Output = input columns + ``rank_col``
    (1-based within group).

    Phase 1 shuffles on (group, salt): n_salts× the keys, 1/n_salts the
    per-key rows.  Phase 2 shuffles only k×n_salts rows per group.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1; got {n_salts}")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    local_w = Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)
    final_w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= k)
        .withColumn(rank_col, F.row_number().over(final_w))
        .filter(F.col(rank_col) <= k)
        .drop("__salt", "__lr")
    )
