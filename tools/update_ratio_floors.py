"""Harden BENCH_RATIO_FLOORS.json with observed-ratio history (VERDICT r4
task 7): scan BASELINE_RUNS.jsonl for CANONICAL gate records (ratio-stamped
AND kdisp==64 — ratios at other dispatch depths are not comparable, the
round-4 finding) and rewrite the floors file with per-metric provenance:

    n_runs, ratio_min, ratio_max, spread (= max/min)

Floor policy (the documented re-record protocol):
  * default: floor = max(existing floor, best observed canonical ratio) —
    accumulating runs can only TIGHTEN the gate; a transient bad-weather
    run can never loosen it;
  * --reset: floor = best observed canonical ratio, discarding the old
    floor — use ONLY after a deliberate perf change that re-baselines a
    metric (record the A/B in BASELINE.md first, per CLAUDE.md).

A spread > 1.25 across calm-weather canonical runs means the matmul-proxy
ref workload decorrelates from that metric (VERDICT r4 weak #4: the
scatter/gather-bound sections can move independently under memory-side
contention) — the tool flags those metrics; the recorded response is a
second, memory-shaped ref workload for the flagged sections.

Usage: python tools/update_ratio_floors.py [--reset] [--dry-run]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BASELINE_RUNS.jsonl")
FLOORS = os.path.join(REPO, "BENCH_RATIO_FLOORS.json")

NOTE = (
    "Weather-normalized floors for bench_all --check: ratio = metric value "
    "/ ref_workload_rate measured bracketing the section in the SAME "
    "process (bench_all.ref_workload_rate). Gate: ratio >= 0.8 * floor. "
    "Floor = best CANONICAL-shape (kdisp=64, full 50-iter windows) ratio "
    "ever recorded; bench_all --check forces that shape. Provenance per "
    "metric: n_runs / ratio_min / ratio_max / spread over the canonical "
    "records in BASELINE_RUNS.jsonl (tools/update_ratio_floors.py). "
    "spread > 1.25 flags ref-workload decorrelation for that metric "
    "(response: a second, memory-shaped ref workload). Bump floors only "
    "via the documented re-record protocol (--reset after a deliberate, "
    "BASELINE.md-recorded perf change)."
)


def canonical_ratios(runs_path: str = RUNS) -> dict[str, list[float]]:
    by: dict[str, list[float]] = collections.defaultdict(list)
    with open(runs_path) as f:
        for line in f:
            r = json.loads(line)
            if (isinstance(r.get("ratio"), (int, float))
                    and r.get("kdisp") == 64):
                by[r["metric"]].append(float(r["ratio"]))
    return dict(by)


def build_floors(history: dict[str, list[float]], old: dict,
                 reset: bool = False) -> tuple[dict, list[str]]:
    out = {"_note": NOTE}
    flagged = []
    metrics = set(history) | {k for k in old if not k.startswith("_")}
    for m in sorted(metrics):
        ratios = history.get(m, [])
        prev = old.get(m, {}) if isinstance(old.get(m), dict) else {}
        best = max(ratios) if ratios else None
        if reset or "floor" not in prev:
            floor = best if best is not None else prev.get("floor")
        else:
            floor = max(prev["floor"], best) if best is not None \
                else prev["floor"]
        if floor is None:
            continue
        ent = {"floor": round(floor, 3), "n_runs": len(ratios)}
        if ratios:
            ent["ratio_min"] = round(min(ratios), 3)
            ent["ratio_max"] = round(max(ratios), 3)
            ent["spread"] = round(max(ratios) / min(ratios), 3)
            if ent["spread"] > 1.25:
                flagged.append(m)
        out[m] = ent
    return out, flagged


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reset", action="store_true",
                    help="re-record floors from observed history, "
                         "discarding old floors (deliberate re-baseline)")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    history = canonical_ratios()
    old = json.load(open(FLOORS)) if os.path.exists(FLOORS) else {}
    floors, flagged = build_floors(history, old, reset=args.reset)
    print(json.dumps(floors, indent=1, sort_keys=True))
    for m in flagged:
        print(f"[spread] {m}: canonical-ratio spread > 1.25 — the matmul "
              f"ref workload decorrelates; consider a memory-shaped ref "
              f"for this section", file=sys.stderr)
    if not args.dry_run:
        with open(FLOORS, "w") as f:
            json.dump(floors, f, indent=1, sort_keys=True)
        print(f"[floors] wrote {FLOORS}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
