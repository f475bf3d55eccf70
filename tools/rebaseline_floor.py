#!/usr/bin/env python3
"""Rebuild BENCH_FLOOR.json across a normalizer change (r18).

r18 re-anchored the calibration references (CpuRef 0.8 -> 0.62, plus a
new I/O dimension with IoRef 0.42) and changed queries_norm to
raw / geomean(cpu_local/CpuRef, io_local/IoRef). Old floor norm values
are therefore on a different scale and CANNOT be min-merged with new
mirrors' norms. The target refs are read from the LAST mirror's
calibration.{cpu,io}.ref (i.e. whatever Bench.scala currently emits),
and every mirror's raw seconds + raw sample tracks — both
ref-independent — are rescaled onto that one normalizer, so a future
re-anchoring in Bench.scala does not silently desynchronize this tool.
This tool:

 - keeps the RAW floor min-merged across everything it is given (raw
   seconds are normalizer-independent, so the accumulated raw floor
   stays);
 - rebuilds the NORM floor exclusively from mirrors that carry the
   two-track calibration (calibration.cpu/io.samples), re-normalizing
   each mirror's raw queries offline with the CURRENT refs so every
   norm in the new floor is on one scale.

Usage:
  python3 tools/rebaseline_floor.py OUT.json OLD_FLOOR.json MIRROR.json...
"""
import json
import math
import sys


def interp(samples, p):
    if p <= samples[0][0]:
        return samples[0][1]
    if p >= samples[-1][0]:
        return samples[-1][1]
    for j in range(len(samples) - 1):
        x0, y0 = samples[j]
        x1, y1 = samples[j + 1]
        if x0 <= p <= x1:
            return y0 + (y1 - y0) * (p - x0) / (x1 - x0)
    return samples[-1][1]


def renorm(mirror, cpu_ref, io_ref):
    """queries_norm recomputed from the mirror's raw queries and its
    recorded two-track calibration samples, under the TARGET refs —
    samples and raw seconds are ref-independent, so any two-track
    mirror can be rescaled onto the current normalizer exactly.
    Positions enumerate ALL queries in sorted order (errored ones
    included), matching Bench's results.zipWithIndex, which indexes
    before filtering errors."""
    cal = mirror["calibration"]
    if "cpu" not in cal or "io" not in cal:
        raise SystemExit("mirror lacks the two-track calibration; only "
                         "r18+ mirrors can seed the norm floor")
    cpu = cal["cpu"]["samples"]
    io = cal["io"]["samples"]
    out = {}
    for i, q in enumerate(sorted(mirror["queries"])):
        v = mirror["queries"][q]
        if not isinstance(v, (int, float)):
            continue  # errored query: occupies a position, emits no norm
        p = i + 0.5
        epoch = math.sqrt(max(1e-9, interp(cpu, p) / cpu_ref) *
                          max(1e-9, interp(io, p) / io_ref))
        out[q] = round(v / epoch, 3)
    return out


def main():
    out_path, old_floor_path, *mirror_paths = sys.argv[1:]
    old = json.load(open(old_floor_path))
    mirrors = [json.load(open(p)) for p in mirror_paths]
    # Target scale = the refs recorded by the LAST (newest) mirror —
    # i.e. whatever Bench.scala currently emits. Every mirror is
    # re-normalized onto that one scale, so the tool can never
    # silently desynchronize from a future re-anchoring in Scala.
    cpu_ref = mirrors[-1]["calibration"]["cpu"]["ref"]
    io_ref = mirrors[-1]["calibration"]["io"]["ref"]
    floor = {"sources": [old_floor_path + " (raw only)"] + mirror_paths,
             "sf": mirrors[0].get("sf", old.get("sf")),
             "normalizer": f"geomean(cpu/{cpu_ref}, io/{io_ref})",
             "queries": {}, "queries_norm": {}}
    # raw: min across the old floor and every mirror
    names = set(old.get("queries", {}))
    for m in mirrors:
        names.update(k for k, v in m.get("queries", {}).items()
                     if isinstance(v, (int, float)))
    for q in sorted(names):
        vals = [old["queries"][q]] if q in old.get("queries", {}) else []
        vals += [m["queries"][q] for m in mirrors
                 if isinstance(m.get("queries", {}).get(q), (int, float))]
        floor["queries"][q] = min(vals)
    # norm: fresh, from re-normalized two-track mirrors only
    renorms = [renorm(m, cpu_ref, io_ref) for m in mirrors]
    norm_names = set()
    for r in renorms:
        norm_names.update(r)
    for q in sorted(norm_names):
        floor["queries_norm"][q] = min(r[q] for r in renorms if q in r)
    json.dump(floor, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"raw floor over old+{len(mirrors)} mirrors, norm floor over "
          f"{len(mirrors)} re-normalized mirrors -> {out_path} "
          f"({len(floor['queries'])} raw / {len(floor['queries_norm'])} "
          f"norm queries)")


if __name__ == "__main__":
    main()
