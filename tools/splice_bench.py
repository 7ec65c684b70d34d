#!/usr/bin/env python3
"""Splice isolated min-of-N bench readings for new queries into a
quiet-bench artifact: adds/replaces per-query entries (min of runs),
appends run arrays, extends the `spliced` list, and recomputes the
artifact total. Usage:

  splice_bench.py <artifact.json> <probe.json>

where <probe.json> is one Bench JSON line produced with
SPARK_GRAFT_ONLY=<new queries> SPARK_GRAFT_RUNS=3.
"""
import json
import sys


def main(artifact_path, probe_path):
    art = json.load(open(artifact_path))
    probe = json.load(open(probe_path))
    spliced = set(art.get("spliced", []))
    for name, t in probe["queries"].items():
        art["queries"][name] = t
        if "runs" in probe and name in probe["runs"]:
            art.setdefault("runs", {})[name] = probe["runs"][name]
        spliced.add(name)
    art["spliced"] = sorted(spliced)
    art["value"] = round(sum(art["queries"].values()), 3)
    json.dump(art, open(artifact_path, "w"))
    print(f"{artifact_path}: {len(art['queries'])} queries, "
          f"total {art['value']}s, "
          f"spliced {sorted(probe['queries'])}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
