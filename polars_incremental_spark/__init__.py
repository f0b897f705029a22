"""polars_incremental_spark — a PySpark-native incremental analytics engine.

A from-scratch rebuild of the capabilities of HamiltonCulik/polars-incremental
(Spark-style incremental micro-batch processing over files/Delta with
checkpoints, CDC merge, schema evolution, job state, maintenance) expressed
idiomatically on the Spark DataFrame / SQL / Structured Streaming stack,
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB-class inputs.
"""

from .cache import (
    operator_cache_scope,
    release_operator_caches,
    scoped_cache_count,
    scoped_persist,
)
from .catalog import DatasetSpec, LocalCatalog
from .cdc import apply_cdc, dedupe_changes, normalize_change_types, strip_cdc_columns
from .errors import (
    ChangeDataFeedError,
    CommitError,
    MissingOptionError,
    PipelineLockError,
    PlanningError,
    ReaderError,
    SchemaEvolutionError,
    SparkIncrementalError,
    TransformError,
    UnsupportedFormatError,
    WriterError,
)
from .observability import BaseObserver, LoggingObserver, PipelineObserver
from .patterns import (
    cross_batch_dedupe,
    drop_late,
    incremental_aggregate,
    latest_per_key,
    route_late,
    upsert_latest,
)
from .pipeline import Pipeline, RunResult, call_with_context
from .schema import SchemaEvolution, apply_schema, widen_types
from .session import get_spark
from .errors import CandidateVolumeError, ConstraintViolationError
from .sinks.delta import (
    apply_cdc_table,
    delete_rows,
    read_table,
    restore_table,
    table_history,
    update_rows,
    write_table,
)
from .sinks.deltalog import (
    add_check_constraint,
    analyze_table,
    clone_table,
    drop_check_constraint,
    merge_into,
    set_table_properties,
)
from .expectations import (
    BatchExpectations,
    Expectation,
    ExpectationViolationError,
    expect,
    expect_or_drop,
    expect_or_fail,
    expect_or_quarantine,
)
from .sinks.parquet import write_parquet_batch
from .sources.base import AutoSource, DeltaSource, FilesSource, infer_source_format
from .state import JobState

__version__ = "0.1.0"

__all__ = [
    "AutoSource",
    "BaseObserver",
    "ChangeDataFeedError",
    "CommitError",
    "CandidateVolumeError",
    "ConstraintViolationError",
    "DatasetSpec",
    "DeltaSource",
    "FilesSource",
    "JobState",
    "LocalCatalog",
    "LoggingObserver",
    "MissingOptionError",
    "operator_cache_scope",
    "release_operator_caches",
    "scoped_cache_count",
    "scoped_persist",
    "Pipeline",
    "PipelineLockError",
    "PipelineObserver",
    "PlanningError",
    "ReaderError",
    "RunResult",
    "SchemaEvolution",
    "SchemaEvolutionError",
    "SparkIncrementalError",
    "TransformError",
    "UnsupportedFormatError",
    "WriterError",
    "add_check_constraint",
    "analyze_table",
    "apply_cdc",
    "apply_cdc_table",
    "apply_schema",
    "clone_table",
    "delete_rows",
    "drop_check_constraint",
    "call_with_context",
    "BatchExpectations",
    "Expectation",
    "ExpectationViolationError",
    "expect",
    "expect_or_drop",
    "expect_or_fail",
    "expect_or_quarantine",
    "cross_batch_dedupe",
    "dedupe_changes",
    "drop_late",
    "get_spark",
    "incremental_aggregate",
    "infer_source_format",
    "latest_per_key",
    "merge_into",
    "normalize_change_types",
    "read_table",
    "restore_table",
    "route_late",
    "set_table_properties",
    "strip_cdc_columns",
    "table_history",
    "update_rows",
    "upsert_latest",
    "widen_types",
    "write_parquet_batch",
    "write_table",
]
