#!/usr/bin/env python3
"""Compare two Bench JSON artifacts: common-query totals, ratio, and
the largest per-query deltas. Usage: compare_bench.py <old> <new>
"""
import json
import sys


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    common = sorted(set(old["queries"]) & set(new["queries"]))
    so = sum(old["queries"][q] for q in common)
    sn = sum(new["queries"][q] for q in common)
    print(f"common {len(common)}  old {so:.1f}s  new {sn:.1f}s  "
          f"ratio {sn / so:.3f}")
    print(f"old load {old.get('load')}  new load {new.get('load')}")
    print(f"new-only queries: "
          f"{sorted(set(new['queries']) - set(old['queries']))}")
    deltas = sorted(((new["queries"][q] - old["queries"][q], q)
                     for q in common), reverse=True)
    print("\nworst regressions:")
    for d, q in deltas[:8]:
        print(f"  {q:40s} {old['queries'][q]:6.2f} -> "
              f"{new['queries'][q]:6.2f}  (+{d:.2f})")
    print("best improvements:")
    for d, q in deltas[-8:]:
        print(f"  {q:40s} {old['queries'][q]:6.2f} -> "
              f"{new['queries'][q]:6.2f}  ({d:+.2f})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
