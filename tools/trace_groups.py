#!/usr/bin/env python3
"""Group traced HLO ops by (name family, output signature) and print totals.

Usage: python tools/trace_groups.py /tmp/trace_plain_bf16 [k]
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            ln = ev.get("args", {}).get("long_name", "")
            if not ln:
                continue
            fam = re.sub(r"\.\d+", "", ev.get("name", ""))
            m = re.match(r"%\S+ = (\([^)]*\)|\S+?)\s", ln)
            sig = m.group(1) if m else "?"
            sig = re.sub(r"\{[^}]*\}", "", sig)[:80]
            agg[(fam, sig)] += ev.get("dur", 0) / 1e3
            cnt[(fam, sig)] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:k]
    tot = sum(agg.values())
    print(f"total: {tot:.1f} ms over 3 steps -> {tot/3:.2f} ms/step")
    for (fam, sig), v in rows:
        print(f"{v/3:8.2f} ms/step  x{cnt[(fam,sig)]//3:<3} {fam:34s} {sig}")


if __name__ == "__main__":
    main()
