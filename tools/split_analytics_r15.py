#!/usr/bin/env python3
"""Round-15 mechanical splitter for operators/Analytics.scala (4,547
lines — past the repo's ~3,000-line guideline; VERDICT r14 task 2):
moves the statistics shelf and the graph shelf into sibling trait
files (AnalyticsStatsOps / AnalyticsGraphOps) self-typed to
Analytics.type and mixed back into the Analytics object, so every
member body stays byte-identical and all intra-object references —
in BOTH directions (stats → core rankByRange, registries →
Analytics.<member>) — keep resolving. Zero behavior change intended;
CORRECTNESS hashes must not move.
"""
import re
import sys

SRC = "src/main/scala/graft/operators/Analytics.scala"

STATS = [
    "chiSquare", "jackknifeRatio", "crossCorrelation", "proportionTest",
    "kmvOverlap", "bradleyTerry", "msprtMonitor", "benfordAudit",
    "concentrationReport", "kaplanMeier", "rocAuc", "gainsTable",
    "cusumShift", "cusumFixedTarget", "changePoint", "seasonalProfile",
    "binnedWoe", "cohenKappa", "associationReport",
    "isotonicCalibration", "simpsonScreen", "permutationTest",
    "bootstrapRatioCI", "wilsonRates", "ebShrinkRates", "qiniCurve",
    "disparateImpact", "cuped", "theilDecomposition",
    "giniConcentration", "conformalCoverage", "bucketCounts",
    "autocorrelation", "burstiness", "spearmanCorr",
]
GRAPH = [
    "pageRank", "markovStationary", "triangleCounts",
    "resourceAllocationScores", "kCore", "labelPropagation",
    "modularityScore", "hits",
]

HEADER = """package graft.operators

import org.apache.spark.sql.{{Column, DataFrame}}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** {doc}
  * Split from [[Analytics]] (round 15); member bodies are unchanged —
  * this trait is self-typed to and mixed back into the same object, so
  * every reference (the shelf's calls into core helpers like
  * `rankByRange`, and every external `Analytics.<member>` call site)
  * resolves exactly as before.
  */
private[graft] trait {name} {{ this: Analytics.type =>
"""


def main():
    lines = open(SRC).read().split("\n")
    # member boundaries: each top-level member starts at its scaladoc
    # `  /**` line; map the def name that follows each scaladoc block
    starts = []  # (lineno, name)
    for i, ln in enumerate(lines):
        if re.match(r"^  /\*\*", ln):
            for j in range(i, min(i + 200, len(lines))):
                m = re.match(r"^  (?:private )?def (\w+)", lines[j])
                if m:
                    starts.append((i, m.group(1)))
                    break
    # block of member k = [start_k, start_{k+1}); last runs to final `}`
    end_of_object = max(i for i, ln in enumerate(lines) if ln == "}")
    blocks = {}
    first_at = {}
    for k, (i, name) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else end_of_object
        if name not in blocks:  # overloads share one scaladoc each
            blocks[name] = []
            first_at[name] = i
        blocks[name].append((i, end))

    for want in STATS + GRAPH:
        assert want in blocks, f"member not found: {want}"

    def extract(names):
        out, cut = [], []
        for n in names:
            for (i, end) in blocks[n]:
                seg = lines[i:end]
                while seg and seg[-1].strip() == "":
                    seg.pop()
                out.append("\n".join(seg))
                cut.append((i, end))
        return out, cut

    stats_out, stats_cut = extract(STATS)
    graph_out, graph_cut = extract(GRAPH)

    def write_trait(path, name, doc, members):
        body = HEADER.format(name=name, doc=doc) + "\n"
        body += "\n\n".join(members)
        body += "\n}\n"
        open(path, "w").write(body)

    write_trait(
        "src/main/scala/graft/operators/AnalyticsStatsOps.scala",
        "AnalyticsStatsOps",
        "Statistics / experimentation / ML-evaluation operators.",
        stats_out)
    write_trait(
        "src/main/scala/graft/operators/AnalyticsGraphOps.scala",
        "AnalyticsGraphOps",
        "Graph / centrality operators over edge-list DataFrames.",
        graph_out)

    drop = set()
    for (i, end) in stats_cut + graph_cut:
        drop.update(range(i, end))
    kept = [ln for i, ln in enumerate(lines) if i not in drop]
    text = "\n".join(kept)
    text = text.replace(
        "object Analytics {",
        "object Analytics extends AnalyticsStatsOps with AnalyticsGraphOps {",
        1)
    # collapse any triple-blank runs the cuts left behind
    text = re.sub(r"\n\n\n+", "\n\n", text)
    open(SRC, "w").write(text)
    print(f"stats: {len(stats_out)} members, "
          f"graph: {len(graph_out)} members")


if __name__ == "__main__":
    main()
