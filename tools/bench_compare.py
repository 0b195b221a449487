#!/usr/bin/env python3
"""Compare two bench records (the SPARK_GRAFT_BENCH_OUT JSON shape):
per-query time ratios and plan-hash drift over the common query set.

Usage: bench_compare.py OLD.json NEW.json [ratio_threshold]
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d, dict(d["queries"]), dict(d.get("plan_hash", {}))


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    do, to, ho = load(old_path)
    dn, tn, hn = load(new_path)
    common = sorted(set(to) & set(tn))
    only_old = sorted(set(to) - set(tn))
    only_new = sorted(set(tn) - set(to))
    so = sum(to[q] for q in common)
    sn = sum(tn[q] for q in common)
    print(f"common={len(common)} only_old={len(only_old)} only_new={len(only_new)}")
    print(f"common totals: old={so:.1f}s new={sn:.1f}s ratio={sn/so:.3f}")
    if only_new:
        extra = sum(tn[q] for q in only_new)
        print(f"new-only queries add {extra:.1f}s: {only_new}")
    drift = [q for q in common if ho.get(q) and hn.get(q) and ho[q] != hn[q]]
    print(f"plan-hash drift on {len(drift)} common queries: {drift}")
    rows = sorted(common, key=lambda q: tn[q] - to[q], reverse=True)
    print(f"\ntop regressions (new-old > 0.3s or ratio > {thr}):")
    for q in rows:
        r = tn[q] / to[q] if to[q] else float("inf")
        if tn[q] - to[q] > 0.3 or r > thr:
            print(f"  {q}: {to[q]:.2f} -> {tn[q]:.2f}  ({r:.2f}x)")
    print("\ntop improvements (old-new > 0.3s):")
    for q in sorted(common, key=lambda q: to[q] - tn[q], reverse=True):
        if to[q] - tn[q] > 0.3:
            print(f"  {q}: {to[q]:.2f} -> {tn[q]:.2f}  ({tn[q]/to[q]:.2f}x)")


if __name__ == "__main__":
    main()
