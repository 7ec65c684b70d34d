#!/usr/bin/env python3
"""Registry-count honesty check (VERDICT r14 task 7): the SURVEY §8
prose counter and the actual query registry drifted twice in past
rounds (q224 caught by the r13 advisor, the r12 §8.2 row gap). This
asserts, statically:

  1. every `"qNN_name"` key that appears in a registry source appears
     with BOTH map arrows (query builder + oracle) or is a shared-name
     reference — i.e. the distinct-name set IS the registry;
  2. query numbers are dense 1..N (a gap means a renamed/deleted query
     the driver's correctness gate would silently skip);
  3. SURVEY.md's "**N queries total**" statement equals N.

Run from the repo root; exits non-zero with a diff on any drift.
"""
import glob
import re
import sys

names = set()
for path in glob.glob("src/main/scala/graft/registry/*.scala"):
    names.update(re.findall(r'"(q\d+_\w+)"', open(path).read()))

nums = sorted(int(re.match(r"q(\d+)_", n).group(1)) for n in names)
n = len(names)
problems = []

dupes = [x for i, x in enumerate(nums) if i and nums[i - 1] == x]
if dupes:
    problems.append(f"duplicate query numbers: {dupes}")
missing = sorted(set(range(1, (nums[-1] if nums else 0) + 1)) - set(nums))
if missing:
    problems.append(f"gaps in query numbering: {missing}")

survey = open("SURVEY.md").read()
m = re.search(r"\*\*(\d+) queries total", survey)
if not m:
    problems.append("SURVEY.md has no '**N queries total' statement")
elif int(m.group(1)) != n:
    problems.append(
        f"SURVEY.md says {m.group(1)} queries; registry has {n}")

if problems:
    print("COUNT CHECK FAILED:")
    for p in problems:
        print(f"  - {p}")
    sys.exit(1)
print(f"OK: {n} queries, dense q01..q{nums[-1]}, SURVEY count matches")
