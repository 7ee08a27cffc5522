#!/usr/bin/env python3
"""Compare two graft.Bench JSON reports per query.

Usage: python3 tools/bench_diff.py BENCH_r03.json BENCH_r04.json [--tol 0.2]

Prints per-query deltas for queries present in both runs, flags changes
outside the tolerance band (default ±20%, ignoring sub-0.2s absolute
deltas — scheduling noise), and lists added/removed queries and errors.
Exit code 0 always (informational tool, not a gate).
"""
import argparse
import json
import sys


def normalize(obj):
    """Restore stripped q_ prefixes so ladder-degraded stdout records and
    full-key sidecars diff against each other."""
    pfx = obj.get("queries_key_prefix")
    if pfx:
        obj["queries"] = {
            (k if k.startswith(pfx) else pfx + k): v
            for k, v in obj.get("queries", {}).items()}
    return obj


def load(path):
    with open(path) as f:
        text = f.read()
    # tolerate sbt-prefixed lines: find the Bench JSON object line
    for line in text.splitlines():
        idx = line.find('{"metric"')
        if idx >= 0:
            return normalize(json.loads(line[idx:]))
    obj = json.loads(text)
    if "queries" in obj:
        return normalize(obj)
    if "timed_sec" in obj:
        # graft.Bench full-precision sidecar (tools/bench_last.json, r7+):
        # prefer it over the decisecond stdout record whenever available
        return {"value": obj.get("total_sec", 0.0),
                "queries": obj["timed_sec"],
                "errors": obj.get("errors", {}), "sf": obj.get("sf")}
    # driver BENCH_r{N}.json wrapper: the Bench line is embedded in "tail"
    tail = obj.get("tail", "")
    idx = tail.rfind('{"metric"')
    if idx >= 0:
        return normalize(json.loads(tail[idx:].splitlines()[0]))
    raise SystemExit(f"{path}: no Bench JSON line found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tol", type=float, default=0.2,
                    help="relative tolerance before flagging (default 0.2)")
    ap.add_argument("--abs", type=float, default=0.2, dest="abs_floor",
                    help="ignore deltas smaller than this many seconds")
    args = ap.parse_args()

    a, b = load(args.old), load(args.new)
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = sorted(set(qa) & set(qb))
    flagged = []
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for q in shared:
        t0, t1 = qa[q], qb[q]
        d = t1 - t0
        mark = ""
        if abs(d) > args.abs_floor and t0 > 0 and abs(d) / t0 > args.tol:
            mark = " <-- " + ("slower" if d > 0 else "faster")
            flagged.append(q)
        print(f"{q:40s} {t0:8.2f} {t1:8.2f} {d:+8.2f}{mark}")
    ta = sum(qa[q] for q in shared)
    tb = sum(qb[q] for q in shared)
    print(f"\nlike-for-like total ({len(shared)} shared queries): "
          f"{ta:.1f}s -> {tb:.1f}s ({tb / ta:.2f}x)" if ta else "")
    print(f"reported totals: {a.get('value', 0):.1f}s -> {b.get('value', 0):.1f}s")
    for name, only in (("only in old", set(qa) - set(qb)),
                       ("only in new", set(qb) - set(qa))):
        if only:
            print(f"{name}: {' '.join(sorted(only))}")
    for label, rep in (("old", a), ("new", b)):
        errs = rep.get("errors") or {}
        if errs:
            print(f"errors in {label}: {json.dumps(errs)}")
    if flagged:
        print(f"\noutside ±{args.tol:.0%} (>|{args.abs_floor}s|): "
              f"{' '.join(flagged)}")
    else:
        print(f"\nall shared queries within ±{args.tol:.0%} "
              f"(or |delta| <= {args.abs_floor}s)")


if __name__ == "__main__":
    sys.exit(main())
