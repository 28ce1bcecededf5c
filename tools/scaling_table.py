#!/usr/bin/env python3
"""Per-query scaling table from two bench artifacts (e.g. sf10 vs sf100).

Usage: python3 tools/scaling_table.py bench_sf10.json bench_sf100.json [threshold]

Prints a markdown table sorted by scaling factor (descending): queries
whose time grew more than `threshold`× (default 15, vs the 10× data
growth between sf10 and sf100) are flagged. Store-backed faces
(q88, q94-q100) write real on-disk state per invocation, so their
constant setup cost shrinks the apparent factor; ANN faces run a
bounded query batch so they should be ~linear in the corpus.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[-1])
    return d


def main():
    lo, hi = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qlo, qhi = lo["queries"], hi["queries"]
    common = sorted(set(qlo) & set(qhi))
    rows = []
    for q in common:
        a, b = qlo[q], qhi[q]
        rows.append((q, a, b, (b / a) if a > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {lo.get('sf','lo')} (s) | {hi.get('sf','hi')} (s) | factor | flag |")
    print("|---|---|---|---|---|")
    for q, a, b, f in rows:
        flag = "**super-linear**" if f > thresh else ""
        print(f"| {q} | {a:.2f} | {b:.2f} | {f:.1f}x | {flag} |")
    tot_lo = sum(qlo[q] for q in common)
    tot_hi = sum(qhi[q] for q in common)
    print(f"\ncommon queries: {len(common)}; total {tot_lo:.1f}s -> {tot_hi:.1f}s "
          f"({tot_hi/tot_lo:.1f}x); flagged (> {thresh}x): "
          f"{sum(1 for r in rows if r[3] > thresh)}")
    only_lo = sorted(set(qlo) - set(qhi))
    only_hi = sorted(set(qhi) - set(qlo))
    if only_lo:
        print(f"only in {sys.argv[1]}: {', '.join(only_lo)}")
    if only_hi:
        print(f"only in {sys.argv[2]}: {', '.join(only_hi)}")
    for name, d in (("lo", lo), ("hi", hi)):
        if d.get("errors"):
            print(f"ERRORS in {name}: {d['errors']}")


if __name__ == "__main__":
    main()
