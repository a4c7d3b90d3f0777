"""Harden BENCH_RATIO_FLOORS.json with observed-ratio history (VERDICT r4
task 7): scan BASELINE_RUNS.jsonl for CANONICAL gate records (ratio-stamped
AND kdisp==64 — ratios at other dispatch depths are not comparable, the
round-4 finding) and rewrite the floors file with per-metric provenance:

    n_runs, ratio_min, ratio_max, spread (= max/min)

Floor policy: floor = MEDIAN of the canonical-history ratios for the
metric's current ref kind. Round-5 finding that forced this (was
max-monotone): the K-scan train metrics are nearly dispatch-insensitive
(mf_train value spread 0.5% over 8 runs) while the one-launch ref
workload is heavily dispatch-bound — one heavy-tunnel run collapsed the
ref 1.44x and inflated the ratio to 511k vs a 360k typical, and a
max-monotone floor would then spuriously fail every later calm run. The
median is robust to ref-side outliers in BOTH directions and
self-corrects as history accumulates; the 0.8 gate slack absorbs normal
ratio variance (observed min ratios sit comfortably above 0.8*median for
every metric). --reset is kept for interface compatibility (median is
recomputed from history either way; with no history the old floor is
preserved).

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
import statistics
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BASELINE_RUNS.jsonl")
FLOORS = os.path.join(REPO, "BENCH_RATIO_FLOORS.json")

NOTE = (
    "Weather-normalized floors for bench_all --check: ratio = metric value "
    "/ ref_workload_rate measured bracketing the section in the SAME "
    "process (bench_all.ref_workload_rate). Gate: ratio >= 0.8 * floor. "
    "Floor = MEDIAN canonical-shape (kdisp=64, full 50-iter windows) "
    "ratio (median, not max: one ref-collapse run inflated a ratio 1.43x "
    "while the metric itself moved 0.5% — round-5 finding, tool "
    "docstring); bench_all --check forces that shape. Provenance per "
    "metric: n_runs / ratio_min / ratio_max / spread over the canonical "
    "records in BASELINE_RUNS.jsonl (tools/update_ratio_floors.py). "
    "spread > 1.25 flags ref-workload decorrelation for that metric "
    "(response: a second, differently-shaped ref workload — applied in "
    "round 5: retrieval_bigvocab gates against the 'topk' ref after its "
    "matmul-ref ratios spread 1.38-1.39x; spreads fell to 1.09-1.10). "
    "Each entry's ref_kind names its ref; when a section's ref changes "
    "the floor re-records from the new-ref history only."
)


def canonical_ratios(runs_path: str = RUNS) -> dict:
    """{metric: (ref_kind, [ratios])} over canonical records. A metric's
    population is the ratios measured against its CURRENT ref kind (the
    most recent record's — when a section's ref changes, e.g. the round-5
    retrieval_bigvocab matmul→topk switch, the old-ref ratios are a
    different population and are excluded)."""
    recs: dict[str, list[tuple[str, float]]] = collections.defaultdict(list)
    with open(runs_path) as f:
        for line in f:
            r = json.loads(line)
            if (isinstance(r.get("ratio"), (int, float))
                    and r.get("kdisp") == 64):
                recs[r["metric"]].append(
                    (r.get("ref_kind", "matmul"), float(r["ratio"])))
    out = {}
    for m, pairs in recs.items():
        kind = pairs[-1][0]
        out[m] = (kind, [v for k, v in pairs if k == kind])
    return out


def build_floors(history: dict, old: dict,
                 reset: bool = False) -> tuple[dict, list[str]]:
    out = {"_note": NOTE}
    flagged = []
    metrics = set(history) | {k for k in old if not k.startswith("_")}
    for m in sorted(metrics):
        kind, ratios = history.get(m, (None, []))
        prev = old.get(m, {}) if isinstance(old.get(m), dict) else {}
        if (kind is not None
                and prev.get("ref_kind", "matmul") != kind):
            prev = {}   # ref changed: the old floor is a different
            # population — start fresh from the new-ref history
        floor = (statistics.median(ratios) if ratios
                 else prev.get("floor"))
        if floor is None:
            continue
        ent = {"floor": round(floor, 3), "n_runs": len(ratios)}
        if kind is not None:
            ent["ref_kind"] = kind
        elif "ref_kind" in prev:
            ent["ref_kind"] = prev["ref_kind"]
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
