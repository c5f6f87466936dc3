#!/usr/bin/env python3
"""Compare two BENCH_FULL per-query JSON lines: overlap median ratio,
largest regressions, and the new/removed query sets. Usage:
benchcmp.py <old.json> <new.json>"""
import json, sys, statistics

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
oq, nq = old["queries"], new["queries"]
both = sorted(set(oq) & set(nq))
added = sorted(set(nq) - set(oq))
removed = sorted(set(oq) - set(nq))
ratios = {k: nq[k] / oq[k] for k in both if oq[k] > 0}
med = statistics.median(ratios.values())
print(f"old: cpus={old.get('cpus')} total={sum(oq.values()):.1f}s "
      f"({len(oq)} queries)")
print(f"new: cpus={new.get('cpus')} total={sum(nq.values()):.1f}s "
      f"({len(nq)} queries)")
print(f"overlap {len(both)}; median ratio {med:.3f}")
print(f"added ({len(added)}): " +
      ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
if removed:
    print(f"removed ({len(removed)}): {', '.join(removed)}")
print("top-10 ratio regressions (>= 0.3s new):")
for k in sorted(both, key=lambda k: -ratios[k])[:10]:
    if nq[k] >= 0.3:
        print(f"  {k}: {oq[k]:.3f} -> {nq[k]:.3f} ({ratios[k]:.2f}x)")
print("top-10 slowest new-tree queries:")
for k in sorted(nq, key=lambda k: -nq[k])[:10]:
    print(f"  {k}: {nq[k]:.3f}s")
