"""Canonical loaders for the driver-generated testdata tables.

``load_table`` normalizes physical-storage quirks so every query sees clean
logical types: the ``events`` table has shipped under several physical
layouts over time (ns-as-int64 with ``nanosAsLong``, µs ``timestamp[us]``
read back as TIMESTAMP_NTZ, plain TIMESTAMP), so we branch on the *actual*
dtype after the read instead of assuming one layout.  Conversion is a pure
Catalyst expression (no UDF), so pushdown/pruning on the other columns is
unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # runtime session conf; required before reading events.parquet (ns timestamps)
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with normalized logical types."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # legacy ns-as-int64 layout: integer division — double division
            # rounds the ns epoch (~1.7e18) before dividing, flipping ~12% of
            # values by 1 µs vs DuckDB's truncation
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type.startswith("timestamp_ntz"):
            # session tz is UTC, so values are identical; must cast (not
            # passthrough) — unix_micros & friends reject TIMESTAMP_NTZ
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        # plain "timestamp": passthrough
    return df


def ensure_parallelism(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rebalance a scan whose split count is below cluster parallelism —
    the single-file / single-row-group case, where a hash-heavy map-side
    projection would otherwise run on ONE core while the rest idle.

    Guarded: when the scan already has >= defaultParallelism partitions
    (any real multi-file table, and ANY table at 100 TB), this returns the
    input untouched — no shuffle is added on the scale path.  The
    repartition only ever moves the small inputs where the shuffle costs
    milliseconds and buys cores.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
