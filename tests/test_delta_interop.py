"""Foreign-reader interop for the jar-less Delta writer (M8/S10 interop gap).

The container has no delta-spark jar, no delta-rs, and no network for
DuckDB's delta extension — so "readable by any Delta client" is proven here
with an INDEPENDENT spec-level reader implemented in this file: plain
``json`` log replay (sharing zero code with ``checkpoints.delta.DeltaLog``)
plus DuckDB's parquet scanner for the data files.  If this replayer — written
against the public Delta protocol spec (PROTOCOL.md: commit files are
newline-delimited JSON actions named ``%020d.json``; a snapshot is the
add-set after applying remove actions in version order; ``schemaString`` is
the Spark StructType JSON) — reconstructs the exact table state, a real
Delta client applying the same rules will too.

Reference parity target: polars-incremental ``sinks/delta.py:10-29`` (tables
it writes are readable by any Delta client).
"""

from __future__ import annotations

import json
import os
import re

import duckdb
import pytest

from polars_incremental_spark.sinks.deltalog import (
    compact_fallback,
    write_delta_fallback,
)

# --------------------------------------------------------------------------
# The independent replayer. Deliberately NOT importing DeltaLog: this is the
# "foreign client" — ~40 lines straight from the protocol spec.
# --------------------------------------------------------------------------

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")


def replay_log(table_path: str) -> dict:
    """Replay ``_delta_log`` per the Delta protocol and return the snapshot:
    {version, protocol, metadata, active: {path: add}, cdc: {version: [cdc]}}.
    """
    log_dir = os.path.join(table_path, "_delta_log")
    versions = []
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            versions.append(int(m.group(1)))
    versions.sort()
    # The protocol requires a contiguous version chain starting at 0.
    assert versions == list(range(len(versions))), versions
    protocol = None
    metadata = None
    active: dict[str, dict] = {}
    cdc: dict[int, list[dict]] = {}
    for v in versions:
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    metadata = action["metaData"]
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
                elif "cdc" in action:
                    cdc.setdefault(v, []).append(action["cdc"])
    return {
        "version": versions[-1] if versions else None,
        "protocol": protocol,
        "metadata": metadata,
        "active": active,
        "cdc": cdc,
    }


def duckdb_scan(table_path: str, snapshot: dict, columns: list[str]) -> list[tuple]:
    """Read the snapshot's data files with DuckDB (union_by_name handles
    schema evolution: pre-evolution files surface new columns as NULL)."""
    files = [os.path.join(table_path, p) for p in snapshot["active"]]
    if not files:
        return []
    con = duckdb.connect()
    cols = ", ".join(columns)
    rows = con.execute(
        f"SELECT {cols} FROM read_parquet(?, union_by_name=true) ORDER BY ALL",
        [files],
    ).fetchall()
    con.close()
    return rows


# --------------------------------------------------------------------------


def _write(spark, table, rows, mode="append", cdc_rows=None, schema="id INT, v STRING"):
    df = spark.createDataFrame(rows, schema)
    cdc_df = None
    if cdc_rows is not None:
        cdc_df = spark.createDataFrame(cdc_rows, schema + ", _change_type STRING")
    write_delta_fallback(df, table, mode=mode, cdc_df=cdc_df)


def test_foreign_replayer_matches_written_state(spark, tmp_path):
    """append → append → overwrite → append, replayed independently."""
    t = str(tmp_path / "t")
    _write(spark, t, [(1, "a"), (2, "b")])
    _write(spark, t, [(3, "c")])
    _write(spark, t, [(10, "x"), (11, "y")], mode="overwrite")
    _write(spark, t, [(12, "z")])

    snap = replay_log(t)
    assert snap["version"] == 3
    rows = duckdb_scan(t, snap, ["id", "v"])
    assert rows == [(10, "x"), (11, "y"), (12, "z")]


def test_log_shape_matches_protocol_spec(spark, tmp_path):
    """Spec-shape invariants a real client depends on: v0 carries protocol +
    metaData; add paths are relative; sizes match the on-disk bytes;
    schemaString parses as a Spark StructType JSON."""
    t = str(tmp_path / "t")
    _write(spark, t, [(1, "a")])

    snap = replay_log(t)
    proto = snap["protocol"]
    assert proto["minReaderVersion"] == 1 and proto["minWriterVersion"] >= 1
    meta = snap["metadata"]
    assert meta["format"]["provider"] == "parquet"
    assert meta["partitionColumns"] == []
    assert meta["id"]
    schema = json.loads(meta["schemaString"])
    assert schema["type"] == "struct"
    assert [f["name"] for f in schema["fields"]] == ["id", "v"]
    for path, add in snap["active"].items():
        assert not path.startswith("/") and ".." not in path
        full = os.path.join(t, path)
        assert os.path.isfile(full)
        assert add["size"] == os.path.getsize(full)
        assert add["partitionValues"] == {}
        assert add["dataChange"] is True
        assert isinstance(add["modificationTime"], int)


def test_schema_evolution_visible_to_foreign_reader(spark, tmp_path):
    """After a mergeSchema append, the logged schemaString carries the new
    column and DuckDB surfaces it as NULL for pre-evolution files."""
    t = str(tmp_path / "t")
    _write(spark, t, [(1, "a")])
    _write(spark, t, [(2, "b", 9.5)], schema="id INT, v STRING, score DOUBLE")

    snap = replay_log(t)
    names = [f["name"] for f in json.loads(snap["metadata"]["schemaString"])["fields"]]
    assert names == ["id", "v", "score"]
    rows = duckdb_scan(t, snap, ["id", "v", "score"])
    assert rows == [(1, "a", None), (2, "b", 9.5)]


def test_compaction_invisible_to_foreign_snapshot(spark, tmp_path):
    """OPTIMIZE rewrites files with dataChange=false; the replayed snapshot
    contents must be unchanged and every action must carry the flag."""
    t = str(tmp_path / "t")
    _write(spark, t, [(1, "a")])
    _write(spark, t, [(2, "b")])
    before = duckdb_scan(t, replay_log(t), ["id", "v"])

    compact_fallback(spark, t)
    snap = replay_log(t)
    assert duckdb_scan(t, snap, ["id", "v"]) == before
    with open(os.path.join(t, "_delta_log", f"{snap['version']:020d}.json")) as fh:
        for line in fh:
            action = json.loads(line)
            for key in ("add", "remove"):
                if key in action:
                    assert action[key]["dataChange"] is False


def test_change_feed_readable_by_foreign_reader(spark, tmp_path):
    """cdc actions point at _change_data/ files DuckDB can read, carrying
    _change_type — the contract read_change_feed clients rely on."""
    t = str(tmp_path / "t")
    _write(spark, t, [(1, "a"), (2, "b")])
    _write(
        spark,
        t,
        [(2, "b2"), (3, "c")],
        cdc_rows=[
            (2, "b", "update_preimage"),
            (2, "b2", "update_postimage"),
            (3, "c", "insert"),
        ],
    )

    snap = replay_log(t)
    assert list(snap["cdc"]) == [1]
    con = duckdb.connect()
    files = [os.path.join(t, c["path"]) for c in snap["cdc"][1]]
    for c in snap["cdc"][1]:
        assert c["path"].startswith("_change_data/")
        assert c["dataChange"] is False
    rows = con.execute(
        "SELECT id, v, _change_type FROM read_parquet(?) ORDER BY ALL", [files]
    ).fetchall()
    con.close()
    assert rows == [
        (2, "b", "update_preimage"),
        (2, "b2", "update_postimage"),
        (3, "c", "insert"),
    ]


def test_empty_append_keeps_log_contiguous(spark, tmp_path):
    """An append of zero rows must still commit a contiguous version (or at
    least never break the chain) — the replayer asserts contiguity."""
    t = str(tmp_path / "t")
    _write(spark, t, [(1, "a")])
    _write(spark, t, [])
    snap = replay_log(t)
    assert duckdb_scan(t, snap, ["id", "v"]) == [(1, "a")]
