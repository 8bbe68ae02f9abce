#!/usr/bin/env python3
"""Compare an sf3 spot-run against the sf1 board: per-query sf3/sf1 ratios
vs the 3x data multiplier. Usage: sf3_ratios.py <sf3.err> <sf1.err>"""
import re
import sys


def parse(path):
    out = {}
    for line in open(path, encoding="utf-8", errors="replace"):
        m = re.match(r"\[bench\] (q\d+\S*) ([0-9.]+)s", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


sf3, sf1 = parse(sys.argv[1]), parse(sys.argv[2])
rows = []
for q, t3 in sorted(sf3.items(), key=lambda kv: -kv[1]):
    t1 = sf1.get(q)
    rows.append((q, t1, t3, t3 / t1 if t1 and t1 > 0.2 else None))
print(f"{'query':34} {'sf1 s':>7} {'sf3 s':>7} {'ratio':>6}")
for q, t1, t3, r in rows:
    print(f"{q:34} {t1 if t1 is not None else float('nan'):7.1f} "
          f"{t3:7.1f} {('%5.1fx' % r) if r else '    —'}")
rs = [r for _, _, _, r in rows if r]
if rs:
    rs.sort()
    print(f"\nn={len(rs)} median {rs[len(rs)//2]:.1f}x "
          f"p90 {rs[int(len(rs)*0.9)]:.1f}x max {rs[-1]:.1f}x "
          f"(3x data; >3x = superlinear)")
