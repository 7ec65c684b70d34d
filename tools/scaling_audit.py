#!/usr/bin/env python3
"""Cross-sf scaling audit: per-query warm (min-of-n) bench time at
sf0.01 vs sf0.1 from two Bench JSON artifacts, with the ratio against
the 10x data-volume ratio. Queries whose ratio materially exceeds the
data ratio (default flag bound 12x) are candidates for a super-linear
plan; queries far below it are fixed-overhead-dominated at this scale.

Usage: scaling_audit.py <bench_sf001.json> <bench_sf01.json> <out.json>
"""
import json
import sys


def main(small_path, big_path, out_path, flag_ratio=12.0):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    qs_s, qs_b = small["queries"], big["queries"]
    rows = {}
    flagged = []
    for name in sorted(set(qs_s) & set(qs_b)):
        ts, tb = qs_s[name], qs_b[name]
        ratio = round(tb / ts, 3) if ts > 0 else None
        rows[name] = {"sf001_sec": round(ts, 3),
                      "sf01_sec": round(tb, 3),
                      "ratio": ratio}
        if ratio is not None and ratio > flag_ratio:
            flagged.append(name)
    out = {
        "data_ratio": 10.0,
        "flag_bound": flag_ratio,
        "n_queries": len(rows),
        "flagged_super_linear": sorted(
            flagged, key=lambda n: -rows[n]["ratio"]),
        "load_sf001": small.get("load"),
        "load_sf01": big.get("load"),
        "queries": rows,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    worst = sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0))[:12]
    print(f"{len(rows)} queries; {len(flagged)} flagged over {flag_ratio}x")
    for name, r in worst:
        print(f"  {name:36s} {r['sf001_sec']:7.3f}s -> {r['sf01_sec']:7.3f}s"
              f"  x{r['ratio']}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
