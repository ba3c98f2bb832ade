#!/usr/bin/env python3
"""Compose two SweepScale outputs (reference decade, target decade) into a
ratio table, flagging gates whose compute grew super-linearly. Usage:
  python3 tools/sweep_compare.py sweep_sf10_r15.json sweep_sf100_r15.json [flag_ratio]
"""
import json
import sys

ref = json.load(open(sys.argv[1]))
tgt = json.load(open(sys.argv[2]))
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

rows = []
for name, t in sorted(tgt.items()):
    r = ref.get(name)
    if not r:
        continue
    ratio = t["sec"] / max(r["sec"], 1e-9)
    rows.append((name, r["sec"], t["sec"], ratio, r["rows"], t["rows"]))

rows.sort(key=lambda x: -x[3])
print(f"{'gate':40s} {'ref s':>8s} {'tgt s':>8s} {'ratio':>7s} {'ref rows':>12s} {'tgt rows':>12s}")
flagged = 0
for name, rs, ts, ratio, rr, tr in rows:
    mark = " <-- FLAG" if ratio > flag and ts > 2.0 else ""
    if mark:
        flagged += 1
    print(f"{name:40s} {rs:8.2f} {ts:8.2f} {ratio:6.1f}x {rr:12d} {tr:12d}{mark}")
print(f"\n{len(rows)} shared gates; {flagged} flagged over {flag}x (and >2 s)")
tot_r = sum(x[1] for x in rows)
tot_t = sum(x[2] for x in rows)
print(f"totals: ref {tot_r:.0f} s -> tgt {tot_t:.0f} s = {tot_t / tot_r:.2f}x for 10x data")
