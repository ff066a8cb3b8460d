"""Reduce an ab_loop.sh log to paired per-round deltas + medians.

    python tools/ab_summary.py /tmp/ab_r15.log [labelA labelB]
"""
from __future__ import annotations

import json
import statistics
import sys


def main():
    path = sys.argv[1]
    la = sys.argv[2] if len(sys.argv) > 2 else "repo"
    lb = sys.argv[3] if len(sys.argv) > 3 else "ab14"
    rows = []
    for line in open(path):
        if "ABJSON" not in line:
            continue
        rows.append(json.loads(line.split("ABJSON ", 1)[1]))
    a = {r["label"]: r for r in rows if r["label"].startswith(la + "#")}
    b = {r["label"]: r for r in rows if r["label"].startswith(lb + "#")}
    pairs = sorted(set(k.split("#")[1] for k in a) &
                   set(k.split("#")[1] for k in b), key=int)
    out = {}
    for metric in ("med24", "med145", "minx100"):
        da = [a[f"{la}#{i}"][metric] for i in pairs]
        db = [b[f"{lb}#{i}"][metric] for i in pairs]
        wins = sum(1 for x, y in zip(da, db) if x < y)
        out[metric] = {
            la: da, lb: db,
            f"{la}_median": statistics.median(da),
            f"{lb}_median": statistics.median(db),
            "pair_ratio_median": statistics.median(
                [x / y for x, y in zip(da, db)]),
            "wins": f"{wins}/{len(pairs)}",
        }
        print(f"{metric:8s} {la} med={out[metric][f'{la}_median']:8.3f} "
              f"{lb} med={out[metric][f'{lb}_median']:8.3f} "
              f"paired-ratio med={out[metric]['pair_ratio_median']:.3f} "
              f"{la} wins {out[metric]['wins']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
