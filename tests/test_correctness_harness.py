"""Meta-tests of the correctness gate itself: the round's entire hard
signal flows through tools/check_correctness.py's comparison, so a harness
that silently passed mismatches would invalidate everything downstream.
These tests prove the comparison REJECTS what it must reject."""

from __future__ import annotations

import datetime as dt
import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "check_correctness", "tools/check_correctness.py"
)
cc = importlib.util.module_from_spec(spec)
sys.modules["check_correctness"] = cc
spec.loader.exec_module(cc)


def test_norm_distinguishes_and_canonicalizes():
    # NULL vs "NULL" string vs 0 must all differ
    assert cc.norm(None) == "NULL" and cc.norm("NULL") == "NULL"  # documented collision
    assert cc.norm(0) != cc.norm(None)
    # float repr is exact: nearby doubles stay distinct
    assert cc.norm(0.1) != cc.norm(0.1 + 1e-15)
    # NaN normalizes stably (NaN != NaN would never match otherwise)
    assert cc.norm(float("nan")) == cc.norm(float("nan"))
    # tz-aware and naive timestamps of the same instant collapse (UTC session)
    aware = dt.datetime(2024, 1, 1, 12, 0, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 1, 1, 12, 0)
    assert cc.norm(aware) == cc.norm(naive)


def test_multiset_compare_rejects_value_and_count_drift():
    cols = ["a", "b"]
    base = cc.rows_to_multiset(cols, [(1, "x"), (2, "y")])
    # same rows, different order -> equal (order-insensitive by design)
    assert base == cc.rows_to_multiset(cols, [(2, "y"), (1, "x")])
    # a single changed value -> unequal
    assert base != cc.rows_to_multiset(cols, [(1, "x"), (2, "z")])
    # duplicate multiplicity matters
    assert base != cc.rows_to_multiset(cols, [(1, "x"), (2, "y"), (2, "y")])
    # column-order insensitivity: same data under reordered columns matches
    assert base == cc.rows_to_multiset(["b", "a"], [("x", 1), ("y", 2)])
    # but a value swapped BETWEEN columns does not
    assert base != cc.rows_to_multiset(cols, [("x", 1), (2, "y")])


def test_float_nan_and_decimal_normalization():
    from decimal import Decimal

    cols = ["v"]
    nan_rows = cc.rows_to_multiset(cols, [(float("nan"),)])
    assert nan_rows == cc.rows_to_multiset(cols, [(float("nan"),)])
    assert nan_rows != cc.rows_to_multiset(cols, [(0.0,)])
    # Decimal("1.5") and float 1.5 deliberately collide (str vs repr agree),
    # but a scale-bearing Decimal("1.50") does NOT — scale drift is caught
    assert cc.rows_to_multiset(cols, [(Decimal("1.5"),)]) == cc.rows_to_multiset(
        cols, [(1.5,)]
    )
    assert cc.rows_to_multiset(cols, [(Decimal("1.50"),)]) != cc.rows_to_multiset(
        cols, [(1.5,)]
    )
