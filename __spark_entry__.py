"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference README pipeline:
1-minute tumbling event-time window aggregation over events —
/root/reference/polars-incremental/README.md:34-42) at sf0.001.

``queries()`` / ``oracle_sql()`` expose the oracle-verified registry in
``polars_incremental_spark.queries`` — one entry per implemented operator
from SURVEY.md §2.6 plus the CDC/schema/watermark framework ops and the
LLM-pipeline operators (dedup / text stats / similarity / multimodal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_incremental_spark import queries as _registry
from polars_incremental_spark.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return (
        events.groupBy(F.window("ts", "1 minute").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each hash-verifiable query."""
    return _registry.oracle_sql()
