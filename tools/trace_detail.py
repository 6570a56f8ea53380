#!/usr/bin/env python3
"""Dump the top individual XLA ops (full names) from a trace produced by
tools/trace_step.py — per-op totals over the 3 traced steps.

Usage: python tools/trace_detail.py /tmp/trace_plain_f32 [k]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    long = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "")
            args = ev.get("args", {})
            ln = args.get("long_name", "")
            if not ln:      # keep only device ops w/ HLO detail
                continue
            agg[name] += ev.get("dur", 0) / 1e3
            long[name] = ln
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:k]
    tot = sum(agg.values())
    print(f"total HLO-op event time: {tot:.1f} ms (3 steps -> {tot/3:.1f}/step)")
    for n, v in rows:
        print(f"{v:8.2f} ms  {n}")
        print(f"            {long[n][:240]}")


if __name__ == "__main__":
    main()
