"""Collate the round-9 scaling artifacts from /tmp into
SCALING_DATA_r09.json (the SCALING_DATA_r08.json successor).

Inputs (produced by the round-9 measurement script):
  /tmp/bench_full_sf1_run1.json   - sf1 full suite, PRE-fix code (diagnostic)
  /tmp/bench_full_sf1_fixed.json  - sf1 full suite, round-9 final code
  /tmp/bench_full_gsf01_fixed.json- generated-sf0.1 full suite, final code
  /tmp/bench_full_h15_local.json  - sf1 heavy-15, local[32]
  /tmp/bench_full_h15_lc.json     - sf1 heavy-15, local-cluster[4,8,4096]
  /tmp/guard_headroom.json        - d17/d18 candidate-volume guard estimates
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALING_DATA_r09.json")


def _load(path):
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return None


def main() -> None:
    guard = _load("/tmp/guard_headroom.json")

    data = {
        "round": 9,
        "sf1_full_prefix_regression_diagnostic": _load(
            "/tmp/bench_full_sf1_run1.json"
        ),
        "sf1_full_s3fix_pre_d17fix": _load("/tmp/bench_full_sf1_fixed.json"),
        "gsf01_full_s3fix_pre_d17fix": _load("/tmp/bench_full_gsf01_fixed.json"),
        "sf1_full_final": _load("/tmp/bench_full_sf1_final.json"),
        "gsf01_full_final": _load("/tmp/bench_full_gsf01_final.json"),
        "driver_sf01_final": _load("/tmp/bench_full_driver_sf01_final.json"),
        "driver_sf01_r8code_today": _load(
            "/tmp/bench_full_driver_sf01_r8code.json"
        ),
        "sf1_d17_isolated_final": _load("/tmp/bench_d17_fix2.json"),
        "sf1_d17_r8code_today": _load("/tmp/bench_d17_r8code.json"),
        "sf1_heavy15_local": _load("/tmp/bench_full_h15_local.json"),
        "sf1_heavy15_localcluster_4096": _load("/tmp/bench_full_h15_lc.json"),
        "sf1_heavy15_localcluster_6144": _load("/tmp/bench_full_h15_lc6144.json"),
        "sf1_d17_isolated_pre_narrowfix": _load("/tmp/bench_d17_sf1.json"),
        "sf1_s3s7_isolated": _load("/tmp/bench_s3s7_sf1.json"),
        # back-to-back same-box isolated pairs for the verify-narrowing
        # trade at sf0.1 (round-9 code vs round-8 code, two repeats each);
        # values transcribed from the interactive runs
        "driver_sf01_d9_g3_backtoback": {
            "r9_code": [
                {"d9_dup_clusters": 4.715, "g3_cluster_sizes": 5.045},
                {"d9_dup_clusters": 4.894, "g3_cluster_sizes": 4.845},
            ],
            "r8_code": [
                {"d9_dup_clusters": 3.45, "g3_cluster_sizes": 3.18},
                {"d9_dup_clusters": 4.446, "g3_cluster_sizes": 3.691},
            ],
        },
        "sf1_d6_isolated_local": _load("/tmp/bench_d6_iso_local.json"),
        "sf1_d6_isolated_localcluster": _load("/tmp/bench_d6_iso_lc.json"),
        "guard_headroom": guard,
    }
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
        fh.write("\n")
    for k, v in data.items():
        if isinstance(v, dict) and "value" in v:
            print(k, v["value"], f"({len(v.get('queries', {}))} queries)")
        else:
            print(k, "present" if v else "MISSING")


if __name__ == "__main__":
    main()
