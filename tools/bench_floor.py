#!/usr/bin/env python3
"""Per-query floor baseline for drift detection (r15 verdict ask #5).

The build VM's wall-clock envelope is ~10-40% epoch noise (NOTES_r15),
so comparing one round's single mirror against the previous round's
single mirror re-litigates noise every round. The FLOOR — per-query min
across several full mirrors of the same tree — is the fairest
steady-state snapshot: an epoch stall inflates one mirror's sample, the
min survives.

Usage:
  build:   python3 tools/bench_floor.py build OUT.json MIRROR.json...
  compare: python3 tools/bench_floor.py compare FLOOR.json MIRROR.json
           [threshold]

`build` takes the per-query min of `queries` (raw) and `queries_norm`
(calibration-normalized) across the mirrors; a query missing from some
mirrors (gates added mid-round) floors over the mirrors that have it.

`compare` prints every query whose NORMALIZED time exceeds
threshold x floor-norm (default 1.3, the NOTES_r15 "real regression"
bar) AND regresses by at least MIN_DELTA seconds absolute (default
0.3 s — a 0.12 s query drifting to 0.24 s is scheduler jitter, not a
plan change), sorted by ratio — the round's drift-suspect list.
Queries new since the floor print as NEW (no verdict).
"""
import json
import sys


def build(out_path, mirror_paths):
    mirrors = [json.load(open(p)) for p in mirror_paths]
    floor = {"sources": mirror_paths, "sf": mirrors[0].get("sf"),
             "queries": {}, "queries_norm": {}}
    for field in ("queries", "queries_norm"):
        names = set()
        for m in mirrors:
            names.update(m.get(field, {}))
        for q in sorted(names):
            vals = [m[field][q] for m in mirrors if q in m.get(field, {})]
            floor[field][q] = min(vals)
    json.dump(floor, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"floor over {len(mirror_paths)} mirrors -> {out_path} "
          f"({len(floor['queries'])} queries)")


def compare(floor_path, mirror_path, threshold=1.3, min_delta=0.3):
    floor = json.load(open(floor_path))
    mirror = json.load(open(mirror_path))
    fq, mq = floor["queries_norm"], mirror.get("queries_norm", {})
    rows = []
    new = []
    for q, v in mq.items():
        if q not in fq:
            new.append(q)
        elif fq[q] > 0:
            rows.append((v / fq[q], q, fq[q], v))
    rows.sort(reverse=True)
    suspects = [r for r in rows
                if r[0] > threshold and r[3] - r[2] >= min_delta]
    print(f"{len(mq)} queries vs floor ({len(fq)}); "
          f"{len(suspects)} above {threshold}x normalized; "
          f"median ratio {sorted(r[0] for r in rows)[len(rows)//2]:.3f}")
    for ratio, q, f, v in suspects:
        print(f"  {q}: {f:.2f} -> {v:.2f} ({ratio:.2f}x)")
    for q in sorted(new):
        print(f"  NEW {q}: {mq[q]:.2f} (no floor)")
    return suspects


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "build":
        build(sys.argv[2], sys.argv[3:])
    elif len(sys.argv) >= 4 and sys.argv[1] == "compare":
        thr = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
        dlt = float(sys.argv[5]) if len(sys.argv) > 5 else 0.3
        compare(sys.argv[2], sys.argv[3], thr, dlt)
    else:
        print(__doc__)
        sys.exit(2)
