#!/usr/bin/env python
"""Compare two bench results and flag per-query regressions.

Usage:
    python tools/bench_compare.py BENCH_r02.json bench_now.json [--tol 0.2]

Accepts either the raw one-line JSON that ``bench.py`` prints or the
driver's ``BENCH_r{N}.json`` wrapper (uses its ``parsed`` field).  Exits 1
if any query present in BOTH runs slowed by more than ``--tol`` (default
20%) AND by more than 0.3 s absolute — the absolute floor keeps sub-second
queries' VM jitter from tripping the gate.

Box-noise normalization: when BOTH results carry ``canary_s`` (min-of-3
wall over 5 frozen queries — bench.py emits it since round 10), every
current-run timing is divided by canary_cur/canary_base before comparing,
so a 1.3x-slower box doesn't read as a 1.3x code regression (round 9: the
same code scored 98.6s and 131.9s on the same driver box days apart).
Pass ``--no-canary`` to compare raw walls.

Per-SEGMENT normalization (round 12): a start-of-suite canary cannot see
mid-session contention (round-11: the driver record overstated the wall
~35% while its start canary matched a clean run's).  When a result
carries ``canary_samples`` (bench.py emits an interleaved single-shot
probe every ~15 queries since round 12), each query is additionally
divided by its enclosing segment's drift — probe wall over the session's
own CLEANEST probe — and every segment whose drift exceeds
``--segment-tol`` (default 1.3) is flagged as contaminated in a noise
verdict, making a polluted session self-adjudicating from its own JSON.
Segment attribution needs the full run order, so feed ``bench_full.json``
(ordered) when available; the driver's trimmed wrapper still yields the
session-level noise verdict.  ``canary_schema`` mismatches between the
two results are reported (the ratio is then not provably like-for-like).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    if "queries" not in data and isinstance(data.get("tail"), str):
        # driver wrapper with parsed:null (rounds 6-7): scrape what the
        # truncated tail preserved — partial but better than nothing
        import re

        scraped = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"([a-z][a-z0-9_]+)":\s*([0-9.]+)', data["tail"])
        }
        scraped.pop("sf", None)
        scraped.pop("value", None)
        # top-level fields the scrape regex also matches — lift canary_s
        # back to where normalization looks for it instead of letting it
        # masquerade as a phantom query (ADVICE r10)
        canary = scraped.pop("canary_s", None)
        scraped.pop("n_queries", None)
        if scraped:
            print(
                f"note: {path} had parsed:null; scraped "
                f"{len(scraped)} query timings from its tail",
                file=sys.stderr,
            )
            data = {"queries": scraped}
            if canary is not None:
                data["canary_s"] = canary
    if "queries" not in data:
        raise SystemExit(f"{path}: no 'queries' field (not a bench result)")
    return data


def segment_factors(
    data: dict, tol: float
) -> tuple[dict[str, float], list[str]]:
    """Per-query drift divisor from interleaved canary samples, plus
    human-readable per-segment noise lines.  Empty when the result has
    no samples (pre-round-12) or no usable run order."""
    samples = data.get("canary_samples") or []
    usable = []
    for s in samples:
        # bench_full.json carries dicts with after_n; the stdout line (and
        # thus the driver's BENCH_rN.json) carries bare floats in run
        # order — usable for the session noise verdict, but not for
        # per-query segment attribution (no after_n)
        if isinstance(s, (int, float)) and s > 0:
            usable.append({"canary_s": float(s), "after_n": None})
        elif (
            isinstance(s, dict)
            and isinstance(s.get("canary_s"), (int, float))
            and s["canary_s"] > 0
        ):
            usable.append(s)
    if not usable:
        return {}, []
    cleanest = min(s["canary_s"] for s in usable)
    lines = []
    factors: dict[str, float] = {}
    names = list(data["queries"])  # insertion order == run order in
    # bench_full.json; the driver's trimmed wrapper is slowest-first, so
    # only use positional attribution when the order can be trusted
    ordered = data.get("detail") is not None or len(names) == (
        data.get("n_queries") or len(names)
    )
    prev_n = 0
    for k, s in enumerate(usable, 1):
        drift = s["canary_s"] / cleanest
        if s["after_n"] is None:
            seg = f"probe {k}"
        else:
            seg = f"queries {prev_n + 1}-{s['after_n']}"
        mark = "  << CONTAMINATED" if drift > tol else ""
        lines.append(
            f"  {seg:<18} probe {s['canary_s']:.3f}s  drift x{drift:.2f}{mark}"
        )
        if ordered and s["after_n"] is not None:
            for i in range(prev_n, min(s["after_n"], len(names))):
                factors[names[i]] = drift
            prev_n = s["after_n"]
    return factors, lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--tol", type=float, default=0.2)
    ap.add_argument("--abs-floor", type=float, default=0.3)
    ap.add_argument("--no-canary", action="store_true")
    ap.add_argument("--segment-tol", type=float, default=1.3)
    ap.add_argument("--no-segment", action="store_true")
    args = ap.parse_args()

    base, cur = load(args.baseline), load(args.current)
    bq, cq = base["queries"], cur["queries"]
    box = 1.0
    if (
        not args.no_canary
        and isinstance(base.get("canary_s"), (int, float))
        and isinstance(cur.get("canary_s"), (int, float))
        and base["canary_s"] > 0
    ):
        box = cur["canary_s"] / base["canary_s"]
        schemas = (base.get("canary_schema"), cur.get("canary_schema"))
        note = ""
        if schemas[0] != schemas[1]:
            note = (
                f" [canary_schema {schemas[0]} vs {schemas[1]}: ratio not "
                "provably like-for-like]"
            )
        print(
            f"canary: base {base['canary_s']:.3f}s -> cur {cur['canary_s']:.3f}s "
            f"(box ratio {box:.3f}; current timings normalized by it){note}"
        )
        cq = {k: v / box for k, v in cq.items()}
    if not args.no_canary and not args.no_segment:
        for label, data, queries in (("base", base, bq), ("cur", cur, cq)):
            factors, lines = segment_factors(data, args.segment_tol)
            if lines:
                n_bad = sum("CONTAMINATED" in ln for ln in lines)
                verdict = (
                    f"{n_bad} contaminated segment(s)" if n_bad else "clean"
                )
                print(f"{label} session noise verdict: {verdict}")
                for ln in lines:
                    print(ln)
            if factors:
                for k, f in factors.items():
                    if k in queries and f > 0:
                        queries[k] = queries[k] / f
    regressions = []
    print(f"{'query':<28} {'base':>8} {'now':>8} {'delta':>8}")
    for name in sorted(set(bq) | set(cq)):
        b, c = bq.get(name), cq.get(name)
        if b is None:
            print(f"{name:<28} {'—':>8} {c:>8.3f}   (new)")
            continue
        if c is None:
            print(f"{name:<28} {b:>8.3f} {'—':>8}   (removed)")
            continue
        pct = (c - b) / b if b > 0 else float("inf")
        mark = ""
        if pct > args.tol and (c - b) > args.abs_floor:
            mark = "  << REGRESSION"
            regressions.append(name)
        pct_s = f"{pct:>+7.0%}" if pct != float("inf") else f"{'+inf':>7}"
        print(f"{name:<28} {b:>8.3f} {c:>8.3f} {pct_s}{mark}")
    shared = [n for n in bq if n in cq]
    tb = sum(bq[n] for n in shared)
    tc = sum(cq[n] for n in shared)
    if tb > 0:
        print(f"\nshared-query total: {tb:.2f}s -> {tc:.2f}s ({(tc - tb) / tb:+.0%})")
    else:
        print("\nno shared queries between the two runs")
    if regressions:
        print(f"REGRESSED: {regressions}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
