"""tools/bench_compare.py canary normalization — the round-over-round
box-drift adjuster the driver-facing BENCH_r{N} comparisons rely on.

Round 9 showed the same code scoring 98.6s and 131.9s days apart on the
driver box; bench.py now emits ``canary_s`` (min-of-3 wall over 5 frozen
queries) and bench_compare divides current timings by
canary_cur/canary_base before flagging regressions.  These tests pin
that arithmetic so a refactor can't silently turn box drift back into
phantom regressions (or mask real ones).
"""

from __future__ import annotations

import json
import subprocess
import sys

TOOL = "tools/bench_compare.py"


def _run(base, cur, tmp_path, *extra):
    bp, cp = tmp_path / "base.json", tmp_path / "cur.json"
    bp.write_text(json.dumps(base))
    cp.write_text(json.dumps(cur))
    return subprocess.run(
        [sys.executable, TOOL, str(bp), str(cp), *extra],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )


def test_box_drift_is_normalized_away(tmp_path):
    # every query 1.5x slower AND the canary 1.5x slower: pure box drift,
    # must NOT flag
    base = {"queries": {"a": 2.0, "b": 4.0}, "canary_s": 1.0}
    cur = {"queries": {"a": 3.0, "b": 6.0}, "canary_s": 1.5}
    r = _run(base, cur, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "canary" in r.stdout


def test_real_regression_survives_normalization(tmp_path):
    # box 1.5x slower, but query b is 4x slower — 2.7x after
    # normalization, must flag
    base = {"queries": {"a": 2.0, "b": 4.0}, "canary_s": 1.0}
    cur = {"queries": {"a": 3.0, "b": 16.0}, "canary_s": 1.5}
    r = _run(base, cur, tmp_path)
    assert r.returncode == 1
    assert "b" in r.stdout and "REGRESSED" in r.stdout
    assert "'a'" not in r.stdout.split("REGRESSED")[-1]


def test_missing_canary_falls_back_to_raw(tmp_path):
    base = {"queries": {"a": 2.0}}
    cur = {"queries": {"a": 3.0}, "canary_s": 1.5}
    r = _run(base, cur, tmp_path)
    assert r.returncode == 1  # raw compare: +50% flags
    assert "canary" not in r.stdout.splitlines()[0]


def test_no_canary_flag_disables_normalization(tmp_path):
    base = {"queries": {"a": 2.0}, "canary_s": 1.0}
    cur = {"queries": {"a": 3.0}, "canary_s": 1.5}
    assert _run(base, cur, tmp_path).returncode == 0  # normalized: parity
    assert _run(base, cur, tmp_path, "--no-canary").returncode == 1


def test_float_canary_samples_yield_noise_verdict(tmp_path):
    # the stdout line (and the driver's BENCH_rN.json) carries bare-float
    # canary_samples since round 12; they must produce a session noise
    # verdict without crashing, and must NOT attribute per-query factors
    # (no after_n available)
    base = {
        "queries": {"a": 2.0, "b": 4.0},
        "canary_s": 1.0,
        "canary_samples": [1.0, 1.05, 1.8],
    }
    cur = {"queries": {"a": 2.0, "b": 4.0}, "canary_s": 1.0}
    r = _run(base, cur, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "1 contaminated segment(s)" in r.stdout
    assert "probe 3" in r.stdout


def test_dict_canary_samples_attribute_segments(tmp_path):
    # bench_full.json's dict samples (with after_n) still drive per-query
    # segment normalization: query b sits in a 2x-drifted segment and its
    # doubled wall must normalize back to parity
    base = {"queries": {"a": 2.0, "b": 4.0}, "canary_s": 1.0}
    cur = {
        "queries": {"a": 2.0, "b": 8.0},
        "canary_s": 1.0,
        "canary_samples": [
            {"after_n": 1, "canary_s": 1.0},
            {"after_n": 2, "canary_s": 2.0},
        ],
    }
    r = _run(base, cur, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CONTAMINATED" in r.stdout
