#!/usr/bin/env python3
"""Mechanical band check: BENCH_r{N}.json vs STEADY.json.

For every query with a steady band, classify the bench artifact's number:
  in-band   value <= max(max * slack, max + noise)
            (slack default 1.5x — the adjudicated contention envelope;
            noise default 0.4s — sub-second queries bounce +-0.2-0.3s
            with box noise, and a 4-run band on a 0.1s query can be
            just 0.06s wide, so a pure multiplicative gate trips on
            timing-floor jitter that means nothing; the absolute term
            is negligible against any query heavy enough to matter)
  OVER      beyond both bounds     -> investigate the code, not the box
  fast      value <  min           (fine; box cooler than the band run)

Every bench query MUST have a band (r15 lesson, twice over: the query
that became the round's biggest outlier was exactly the one the steady
table skipped) — a bench query with no band is NO_BAND and fails the
check the same as OVER. Exit code 1 if any OVER/FAILED/NO_BAND, so a
driver/judge/close can gate on it.

usage: steady_check.py BENCH_rN.json [STEADY.json] [slack] [noise]
"""
import json
import sys

bench_path = sys.argv[1]
steady_path = sys.argv[2] if len(sys.argv) > 2 else "STEADY.json"
slack = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
noise = float(sys.argv[4]) if len(sys.argv) > 4 else 0.4

bench = json.load(open(bench_path))
steady = json.load(open(steady_path))

over = []
rows = []
for name, band in sorted(steady["queries"].items()):
    v = bench["queries"].get(name)
    if v is None:
        rows.append((name, None, band, "MISSING"))
        continue
    lim = max(band["max"] * slack, band["max"] + noise)
    if v < 0:
        cls = "FAILED"
    elif v > lim:
        cls = "OVER"
    elif v < band["min"]:
        cls = "fast"
    else:
        cls = "in-band"
    if cls in ("OVER", "FAILED"):
        over.append(name)
    rows.append((name, v, band, cls))

unbanded = sorted(set(bench["queries"]) - set(steady["queries"]))
for name in unbanded:
    over.append(name)
    print(f"{name:42s} {bench['queries'][name]:7.2f}  NO_BAND")

for name, v, band, cls in rows:
    vtxt = f"{v:7.2f}" if v is not None else "   n/a "
    print(f"{name:42s} {vtxt}  band {band['min']:.2f}-{band['max']:.2f}"
          f" (median {band['median']:.2f})  {cls}")
print(f"\nbench load_avg={bench.get('load_avg')} producer="
      f"{bench.get('producer', '?')} | steady load_avg_end="
      f"{steady.get('load_avg_end')} producer={steady.get('producer', '?')}"
      f" | slack {slack}x | {len(over)} over-band")
sys.exit(1 if over else 0)
