"""CDC merge semantics (reference tests/test_cdc_frame.py / test_cdc_apply.py
analog): latest-change-wins, delete handling, change_type_map, commit-version
dedupe, append_only, table-level apply round-trip."""

import pytest

from polars_incremental_spark import apply_cdc, apply_cdc_table


CH_SCHEMA = "id long, name string, amount double, _change_type string, _commit_version long"


def _df(spark, rows, cols):
    if cols == ["id", "name", "amount", "_change_type", "_commit_version"]:
        return spark.createDataFrame(rows, CH_SCHEMA)
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def existing(spark):
    return _df(
        spark,
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        ["id", "name", "amount"],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_insert_update_delete(spark, existing):
    changes = _df(
        spark,
        [
            (4, "dave", 40.0, "insert", 1),
            (2, "bobby", 25.0, "update_postimage", 1),
            (3, None, None, "delete", 1),
        ],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, existing, keys=["id"])
    assert _rows(out) == [(1, "alice", 10.0), (2, "bobby", 25.0), (4, "dave", 40.0)]
    assert "_change_type" not in out.columns


def test_latest_change_wins_by_commit_version(spark, existing):
    changes = _df(
        spark,
        [
            (2, "v1", 1.0, "update_postimage", 1),
            (2, "v2", 2.0, "update_postimage", 2),
            (2, "v3", 3.0, "update_postimage", 3),
        ],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, existing, keys=["id"])
    assert (2, "v3", 3.0) in _rows(out)


def test_latest_delete_wins(spark, existing):
    changes = _df(
        spark,
        [
            (2, "upd", 99.0, "update_postimage", 1),
            (2, None, None, "delete", 2),
        ],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, existing, keys=["id"])
    assert [r[0] for r in _rows(out)] == [1, 3]


def test_tie_breaks_by_input_row_order(spark, existing):
    # same commit version: the LATER input row wins (reference cdc.py:195-209)
    changes = _df(
        spark,
        [
            (2, "first", 1.0, "update_postimage", 7),
            (2, "second", 2.0, "update_postimage", 7),
        ],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, existing, keys=["id"])
    assert (2, "second", 2.0) in _rows(out)


def test_change_type_map(spark, existing):
    changes = _df(
        spark,
        [(5, "eve", 50.0, "I", 1), (1, None, None, "D", 1)],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(
        changes,
        existing,
        keys=["id"],
        change_type_map={"I": "insert", "U": "update_postimage", "D": "delete"},
    )
    ids = [r[0] for r in _rows(out)]
    assert ids == [2, 3, 5]


def test_update_preimage_ignored(spark, existing):
    changes = _df(
        spark,
        [
            (2, "old", 20.0, "update_preimage", 1),
            (2, "new", 21.0, "update_postimage", 1),
        ],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, existing, keys=["id"])
    assert (2, "new", 21.0) in _rows(out)


def test_ignore_delete(spark, existing):
    changes = _df(
        spark,
        [(3, None, None, "delete", 1)],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, existing, keys=["id"], ignore_delete=True)
    assert len(_rows(out)) == 3


def test_append_only_keeps_inserts_only(spark, existing):
    changes = _df(
        spark,
        [
            (6, "f", 60.0, "insert", 1),
            (2, "x", 0.0, "update_postimage", 1),
            (1, None, None, "delete", 1),
        ],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, existing, keys=["id"], mode="append_only")
    ids = [r[0] for r in _rows(out)]
    assert ids == [1, 2, 3, 6]


def test_merge_into_empty_target(spark):
    changes = _df(
        spark,
        [(1, "a", 1.0, "insert", 1)],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    out = apply_cdc(changes, None, keys=["id"])
    assert _rows(out) == [(1, "a", 1.0)]


def test_apply_cdc_table_roundtrip(spark, tmp_path):
    target = str(tmp_path / "target")
    first = _df(
        spark,
        [(1, "a", 1.0, "insert", 1), (2, "b", 2.0, "insert", 1)],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    res = apply_cdc_table(spark, first, target, keys=["id"])
    assert res["action"] == "merge" and res["rows_out"] == 2
    second = _df(
        spark,
        [(1, "a2", 9.0, "update_postimage", 2), (2, None, None, "delete", 2)],
        ["id", "name", "amount", "_change_type", "_commit_version"],
    )
    res2 = apply_cdc_table(spark, second, target, keys=["id"])
    assert res2["rows_out"] == 1
    # read through the table API: the target is a log-backed delta table and
    # overwritten files stay on disk (invisible to the snapshot) until vacuum
    from polars_incremental_spark.sinks.delta import read_table

    final = sorted(tuple(r) for r in read_table(spark, target).collect())
    assert final == [(1, "a2", 9.0)]


def test_apply_cdc_table_noop_on_empty(spark, tmp_path):
    empty = spark.createDataFrame([], "id long, _change_type string")
    res = apply_cdc_table(spark, empty, str(tmp_path / "t"), keys=["id"])
    assert res == {"rows_in": 0, "rows_out": 0, "action": "noop"}


def test_apply_cdc_randomized_differential(spark):
    """200 random changes vs a pure-Python replay oracle: latest change per
    key (by commit version) wins; delete removes, upsert replaces."""
    import random

    rng = random.Random(42)
    keys = list(range(30))
    changes = []
    for version in range(1, 201):
        k = rng.choice(keys)
        ct = rng.choice(["insert", "update_postimage", "update", "delete", "update_preimage"])
        changes.append((k, f"v{version}", ct, version))

    existing_rows = [(k, f"base{k}") for k in keys if k % 3 == 0]

    changes_df = spark.createDataFrame(
        changes, ["k", "v", "_change_type", "_commit_version"]
    )
    existing_df = spark.createDataFrame(existing_rows, ["k", "v"])
    got = {r["k"]: r["v"] for r in apply_cdc(changes_df, existing_df, keys=["k"]).collect()}

    # oracle: preimages are FILTERED before dedupe (reference cdc.py:86-100),
    # so the latest NON-preimage change per key governs the outcome
    latest = {}
    for k, v, ct, _version in changes:
        if ct != "update_preimage":
            latest[k] = (v, ct)
    base = dict(existing_rows)
    for k in keys:
        if k in latest:
            v, ct = latest[k]
            expected_k = None if ct == "delete" else v
        else:
            expected_k = base.get(k)  # untouched (or preimage-only) key
        if expected_k is None:
            assert k not in got, k
        else:
            assert got.get(k) == expected_k, (k, got.get(k), expected_k)
