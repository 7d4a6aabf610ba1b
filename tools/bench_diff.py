#!/usr/bin/env python3
"""Diff two BENCH_DETAIL.json files (before, after): per-query medians,
geomean speedup over queries >= a floor, and the biggest movers."""
import json, math, sys

def load(p):
    d = json.load(open(p))
    qs = {k: v["med"] for k, v in d["query_stats"].items() if v["med"] >= 0}
    return d, qs

def main(a, b, floor=0.3):
    da, qa = load(a)
    db, qb = load(b)
    common = sorted(set(qa) & set(qb))
    print(f"before total {da['value']:.1f} (floor {da['floor']:.1f}, contended {da['contended']})")
    print(f"after  total {db['value']:.1f} (floor {db['floor']:.1f}, contended {db['contended']})")
    big = [q for q in common if max(qa[q], qb[q]) >= floor]
    logs = [math.log(qa[q] / qb[q]) for q in big]
    print(f"geomean speedup over {len(big)} queries >= {floor}s: "
          f"{math.exp(sum(logs)/len(logs)):.3f}x")
    movers = sorted(big, key=lambda q: qb[q] - qa[q])
    print("\nbiggest improvements (before -> after):")
    for q in movers[:18]:
        print(f"  {q:34s} {qa[q]:7.3f} -> {qb[q]:7.3f}  ({qb[q]-qa[q]:+.3f})")
    print("\nbiggest regressions:")
    for q in movers[-10:][::-1]:
        print(f"  {q:34s} {qa[q]:7.3f} -> {qb[q]:7.3f}  ({qb[q]-qa[q]:+.3f})")
    print(f"\nsum before {sum(qa[q] for q in common):.1f}  after {sum(qb[q] for q in common):.1f}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 0.3)
