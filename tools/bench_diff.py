#!/usr/bin/env python3
"""Cross-round bench regression report: compare two bench JSON objects
(the full line Bench writes to bench_last.json, or a BENCH_r*.json whose
"parsed" field or raw line survives) and flag per-query movers.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--thresh 0.3] [--abs 0.4]

A query is flagged when it moved more than --thresh (relative) AND more
than --abs seconds (absolute) — the same bar the round-7 verdict used to
isolate the LSH-family movers. Queries present on only one side are
listed separately (board shrink/growth is itself a finding).
"""
import json, sys


def load(path):
    import re
    with open(path) as f:
        txt = f.read().strip()
    try:
        obj = json.loads(txt)
    except json.JSONDecodeError:
        obj = json.loads(txt.splitlines()[-1])
    # driver BENCH_r*.json wraps the line: {"parsed": {...}} or, when the
    # stdout capture truncated the head, only a raw "tail" string survives —
    # recover whatever per-query pairs the tail still holds
    if "queries" not in obj and isinstance(obj.get("parsed"), dict):
        obj = obj["parsed"]
    if "queries" not in obj and isinstance(obj.get("tail"), str):
        pairs = re.findall(r'"(q[a-z0-9_]+)":([0-9.]+)', obj["tail"])
        obj = dict(obj, queries={k: float(v) for k, v in pairs},
                   value=obj.get("value"))
        for m in re.finditer(r'"(ref_[a-z_]+_50k)":([0-9.]+)', obj["tail"]):
            obj[m.group(1)] = float(m.group(2))
    return obj


def main():
    thresh = 0.3
    absec = 0.4
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] in ("--thresh", "--abs"):
            if i + 1 >= len(argv):
                sys.exit(f"{argv[i]} needs a value")
            if argv[i] == "--thresh":
                thresh = float(argv[i + 1])
            else:
                absec = float(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) != 2:
        sys.exit("usage: bench_diff.py OLD.json NEW.json [--thresh R] [--abs S]")
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    both = sorted(set(oq) & set(nq))
    print(f"old: total={old.get('value')}s n={len(oq)} | "
          f"new: total={new.get('value')}s n={len(nq)}")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"DROPPED from board ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new)}")
    shared_old = sum(oq[k] for k in both)
    shared_new = sum(nq[k] for k in both)
    if both and shared_old > 0:
        print(f"shared {len(both)} queries: {shared_old:.1f}s -> {shared_new:.1f}s "
              f"({(shared_new / shared_old - 1) * 100:+.0f}%)")
    else:
        print("no shared queries with nonzero old time - nothing to compare")
    movers = []
    for k in both:
        a, b = oq[k], nq[k]
        if a > 0 and abs(b - a) / a > thresh and abs(b - a) > absec:
            movers.append((b - a, k, a, b))
    for d, k, a, b in sorted(movers, reverse=True):
        print(f"  MOVER {k:28s} {a:7.3f} -> {b:7.3f}  ({d:+.2f}s)")
    if not movers:
        print("  no movers past the threshold")
    # serving QPS deltas
    for key in sorted(set(old) & set(new)):
        if key.startswith("ref_") and key.endswith("_50k"):
            print(f"  {key}: {old[key]:.0f} -> {new[key]:.0f}")


if __name__ == "__main__":
    main()
