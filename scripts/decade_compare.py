#!/usr/bin/env python3
"""Per-query growth across a fixture decade.

Usage: scripts/decade_compare.py BENCH_full_small.json BENCH_full_big.json

Prints a markdown table of per-family time growth (median per-query
ratio big/small) for a 10x data step, plus the individual queries with
the largest ratios. A ratio near 1 means the query is floor-dominated
(planning/codegen); near 10 means fully data-bound linear work; above
~12 flags possible super-linear behavior worth a plan read. Medians,
not sums — host stalls inflate sums (SCALE.md r15e).
"""
import json
import statistics
import sys


def family(name):
    parts = name.split("_")
    return "_".join(parts[:2]) if len(parts) > 1 else name


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    qs, qb = small["queries"], big["queries"]
    shared = sorted(set(qs) & set(qb))
    only_small = sorted(set(qs) - set(qb))
    if only_small:
        print(f"not in big run ({len(only_small)}): {', '.join(only_small)}\n")
    ratios = {n: (qb[n] / qs[n] if qs[n] > 0 else float("inf")) for n in shared}
    fams = {}
    for n in shared:
        fams.setdefault(family(n), []).append(n)
    print("| family | n | median small s | median big s | median ratio |")
    print("|---|---|---|---|---|")
    rows = []
    for f, names in fams.items():
        rows.append((f, len(names),
                     statistics.median(qs[n] for n in names),
                     statistics.median(qb[n] for n in names),
                     statistics.median(ratios[n] for n in names)))
    for f, n, ms, mb, mr in sorted(rows, key=lambda r: -r[4]):
        print(f"| {f} | {n} | {ms:.3f} | {mb:.3f} | {mr:.2f} |")
    print(f"\nsuite totals: small {small['value']} s ({len(qs)} q), "
          f"big {big['value']} s ({len(qb)} q); shared-median ratio "
          f"{statistics.median(ratios[n] for n in shared):.2f}")
    print("\ntop-15 per-query ratios:")
    for n in sorted(shared, key=lambda n: -ratios[n])[:15]:
        print(f"  {n}: {qs[n]:.3f} -> {qb[n]:.3f} s  ({ratios[n]:.1f}x)")


if __name__ == "__main__":
    main()
