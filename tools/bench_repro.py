#!/usr/bin/env python3
"""Cross-run bench reproducibility check (r12 verdict item 1's Done
criterion): compare two close-run bench JSONs per query and report the
distribution of |run2/run1 - 1|, the worst offenders, and the shared
totals. Usage: python3 tools/bench_repro.py run1.json run2.json"""
import json
import sys


def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            o = json.loads(line)
            if o.get("metric") == "total" and "queries" in o:
                return o
    raise SystemExit(f"no full bench object in {p}")


a, b = load(sys.argv[1]), load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
print(f"shared queries: {len(shared)} "
      f"(run1 {len(qa)}, run2 {len(qb)})")
ta, tb = sum(qa[q] for q in shared), sum(qb[q] for q in shared)
print(f"shared totals: {ta:.1f}s -> {tb:.1f}s ({(tb/ta-1)*100:+.1f}%)")

rel = []
for q in shared:
    x, y = qa[q], qb[q]
    if max(x, y) < 0.15:  # sub-150ms timings are scheduler noise
        continue
    rel.append((abs(y / max(x, 1e-9) - 1), q, x, y))
rel.sort(reverse=True)
n = len(rel)
within5 = sum(1 for r, *_ in rel if r <= 0.05)
within10 = sum(1 for r, *_ in rel if r <= 0.10)
within20 = sum(1 for r, *_ in rel if r <= 0.20)
med = sorted(r for r, *_ in rel)[n // 2] if n else 0.0
print(f"queries >=150ms: {n}; median |delta| {med*100:.1f}%; "
      f"within 5%: {within5}/{n}, within 10%: {within10}/{n}, "
      f"within 20%: {within20}/{n}")
print("worst 12:")
for r, q, x, y in rel[:12]:
    print(f"  {q:<28} {x:7.3f} -> {y:7.3f}  ({r*100:+.0f}%)")
