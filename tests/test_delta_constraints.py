"""CHECK constraints on the jar-less Delta path.

Real Delta stores them as ``delta.constraints.<name>`` in
``metaData.configuration`` (writer protocol v3) and enforces on every
write; ``ALTER TABLE ADD CONSTRAINT`` validates existing data first.
Same contract here, without the jar.
"""

import json
import os

import pytest

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.errors import ConstraintViolationError
from polars_incremental_spark.sinks.delta import read_table, write_table
from polars_incremental_spark.sinks.deltalog import (
    add_check_constraint,
    checkpoint_log,
    drop_check_constraint,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, amount double"),
        path,
    )
    return path


def test_add_constraint_then_violating_write_rejected(spark, table):
    add_check_constraint(spark, table, "amount_positive", "amount > 0")
    log = DeltaLog(table)
    v_before = log.latest_version()
    with pytest.raises(ConstraintViolationError, match="amount_positive"):
        write_table(
            spark.createDataFrame([(3, -5.0)], "id long, amount double"), table
        )
    # rejected batch left no log growth and no orphan data files
    assert DeltaLog(table).latest_version() == v_before
    assert read_table(spark, table).count() == 2
    # a conforming write still lands
    write_table(
        spark.createDataFrame([(3, 5.0)], "id long, amount double"), table
    )
    assert read_table(spark, table).count() == 3


def test_null_passes_check_like_sql(spark, table):
    add_check_constraint(spark, table, "amount_positive", "amount > 0")
    write_table(
        spark.createDataFrame([(4, None)], "id long, amount double"), table
    )
    assert read_table(spark, table).count() == 3


def test_add_constraint_validates_existing_data(spark, table):
    write_table(
        spark.createDataFrame([(9, -1.0)], "id long, amount double"), table
    )
    with pytest.raises(ConstraintViolationError):
        add_check_constraint(spark, table, "amount_positive", "amount > 0")
    # failed ALTER leaves no constraint behind
    conf = (DeltaLog(table).table_metadata() or {}).get("configuration") or {}
    assert not any(k.startswith("delta.constraints.") for k in conf)


def test_protocol_bump_and_log_shape(spark, table):
    add_check_constraint(spark, table, "id_range", "id < 1000")
    log = DeltaLog(table)
    actions = list(log.actions(log.latest_version()))
    protos = [a["protocol"] for a in actions if "protocol" in a]
    assert protos and protos[0]["minWriterVersion"] >= 3
    metas = [a["metaData"] for a in actions if "metaData" in a]
    assert metas[0]["configuration"]["delta.constraints.id_range"] == "id < 1000"


def test_drop_constraint(spark, table):
    add_check_constraint(spark, table, "amount_positive", "amount > 0")
    drop_check_constraint(table, "amount_positive")
    write_table(
        spark.createDataFrame([(5, -1.0)], "id long, amount double"), table
    )
    assert read_table(spark, table).count() == 3
    with pytest.raises(ValueError, match="no such constraint"):
        drop_check_constraint(table, "amount_positive")


def test_duplicate_name_rejected(spark, table):
    add_check_constraint(spark, table, "c1", "amount > 0")
    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, table, "c1", "amount > 1")


def test_constraint_on_missing_column_fails_closed(spark, table):
    add_check_constraint(spark, table, "c1", "amount > 0")
    with pytest.raises(ConstraintViolationError):
        write_table(spark.createDataFrame([(7,)], "id long"), table)


def test_constraints_survive_checkpoint_and_schema_merge(spark, table):
    add_check_constraint(spark, table, "amount_positive", "amount > 0")
    # schema-evolving conforming write keeps configuration through the
    # merged metaData action
    write_table(
        spark.createDataFrame(
            [(6, 1.0, "x")], "id long, amount double, note string"
        ),
        table,
    )
    checkpoint_log(table)
    meta = DeltaLog(table).table_metadata() or {}
    assert meta["configuration"]["delta.constraints.amount_positive"] == "amount > 0"
    with pytest.raises(ConstraintViolationError):
        write_table(
            spark.createDataFrame([(8, -2.0)], "id long, amount double"), table
        )
