"""Round-4 regression tests.

The driver regenerated /root/testdata between rounds 2 and 3, switching
``events.ts`` from ns-as-int64 to parquet ``timestamp[us]`` (read back by
Spark as TIMESTAMP_NTZ).  ``load_table`` must normalize every physical
layout it has ever seen to a plain TIMESTAMP column with identical values.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from polars_incremental_spark.tables import load_table

from tests.conftest import SF_DIR

# one known row per layout: epoch values chosen so µs truncation matters
_NS = [1_700_000_000_123_456_789, 1_700_000_060_000_000_001]
_US = [v // 1000 for v in _NS]


def _write_events(path: str, ts_array: pa.Array) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "error"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}']),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def layouts(tmp_path_factory):
    """Three sibling sf-dirs, each with events.parquet in a different physical layout."""
    dirs = {}
    for name, arr in {
        "ns_int64": pa.array(_NS, pa.int64()),
        "ts_us": pa.array(_US, pa.timestamp("us")),
        "ts_us_utc": pa.array(_US, pa.timestamp("us", tz="UTC")),
    }.items():
        d = tmp_path_factory.mktemp(f"layout_{name}")
        _write_events(str(d / "events.parquet"), arr)
        dirs[name] = str(d)
    return dirs


def test_load_table_all_event_layouts(spark, layouts):
    """Every physical layout yields identical TIMESTAMP values (µs truncation)."""
    results = {}
    for name, d in layouts.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", name
        # downstream ops like unix_micros must work (rejects TIMESTAMP_NTZ)
        from pyspark.sql import functions as F

        rows = df.select("event_id", F.unix_micros("ts").alias("us")).orderBy("event_id").collect()
        results[name] = [(r.event_id, r.us) for r in rows]
    expected = list(zip([1, 2], _US))
    for name, got in results.items():
        assert got == expected, name


def test_load_table_current_testdata(spark):
    """The real driver testdata loads and ts is a plain timestamp."""
    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).count() == 1


def test_entry_smoke(spark):
    """Flagship entry() runs against current testdata and returns rows."""
    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver testdata absent")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"window_start", "event_type", "n_events", "sum_value"}


def test_entry_survives_layout_drift(spark, layouts, monkeypatch):
    """entry() works no matter which physical layout the driver regenerates."""
    import __spark_entry__ as e

    for name, d in layouts.items():
        orig = load_table

        def fake(spark_, sf_dir, table, _d=d):
            return orig(spark_, _d, table)

        monkeypatch.setattr(e, "load_table", fake)
        df = e.entry(spark)
        assert df.count() > 0, name
