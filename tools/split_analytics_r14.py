#!/usr/bin/env python3
"""Round-14 mechanical splitter for registry/AnalyticsRegistry.scala:
moves the statistics/ML-eval shelf and the graph shelf into sibling
trait files (AnalyticsStatsShelf / AnalyticsGraphShelf) mixed back into
the AnalyticsRegistry object, so every member body stays byte-identical
and all intra-object references keep resolving. Zero behavior change
intended; CORRECTNESS hashes must not move.
"""
import re
import sys

SRC = "src/main/scala/graft/registry/AnalyticsRegistry.scala"

STATS = {
    "q160_calibration_report", "q164_ks_drift", "q181_robust_outliers",
    "q186_jackknife_ratio", "q187_l_diversity",
    "q188_position_attribution", "q189_benford_audit",
    "q190_spend_concentration", "q191_kaplan_meier", "q192_roc_auc",
    "q193_gains_lift", "q194_cusum_shift", "q195_seasonal_dow",
    "q196_price_woe", "q197_quality_kappa",
    "q198_segment_priority_assoc", "q199_isotonic_calibration",
    "q200_simpson_screen", "q201_permutation_test",
    "q203_cuped_adjustment", "q205_cusum_monitor", "q206_change_point",
    "q208_bootstrap_ci", "q209_qini_uplift", "q211_conversion_delay",
    "q214_disparate_impact", "q215_msprt_monitor",
    "q216_brand_bradley_terry", "q219_kmv_overlap",
}
GRAPH = {
    "q154_supplier_pagerank", "q178_markov_stationary",
    "q179_part_triangles", "q183_link_prediction",
    "q220_join_forecast", "q221_k_core",
}

# helpers to force into a given shelf (dependency closure, found by
# compiler iteration; names are member defs/vals)
FORCE_STATS: set = set(sys.argv[1].split(",")) if len(sys.argv) > 1 and sys.argv[1] else set()
FORCE_GRAPH: set = set(sys.argv[2].split(",")) if len(sys.argv) > 2 and sys.argv[2] else set()

text = open(SRC).read()
lines = text.split("\n")

# ---- locate the three regions -------------------------------------
hdr_end = next(i for i, l in enumerate(lines)
               if l.startswith("private[graft] object AnalyticsRegistry"))
q_start = next(i for i, l in enumerate(lines) if l.startswith("  def queries"))
o_start = next(i for i, l in enumerate(lines) if l.startswith("  def oracleSql"))
# map closers: first line == "  )" after each start
q_end = next(i for i in range(q_start, len(lines)) if lines[i] == "  )")
o_end = next(i for i in range(o_start, len(lines)) if lines[i] == "  )")
assert q_end < o_start < o_end

header = "\n".join(lines[:hdr_end])  # package + imports + file doc

# ---- split the queries map entries ---------------------------------
def split_map_entries(start, end):
    """entries between start+1 .. end-1; each begins with 4-space `"q`."""
    entries = []
    cur = None
    for i in range(start + 1, end):
        if re.match(r'^    "q', lines[i]):
            if cur:
                entries.append(cur)
            cur = [i, i]
        elif cur:
            cur[1] = i
    if cur:
        entries.append(cur)
    out = []
    for a, b in entries:
        m = re.match(r'^    "(q[0-9]+[a-z_0-9]*)"', lines[a])
        out.append((m.group(1), "\n".join(lines[a:b + 1])))
    return out

q_entries = split_map_entries(q_start, q_end)
o_entries = split_map_entries(o_start, o_end)

# ---- split the member blocks after the oracle map -------------------
# members start at col-2 `/**` (scaladoc) or col-2 modifiers/defs or
# col-2 `//` comment runs attached to the following member
starts = []
i = o_end + 1
n = len(lines)
member_re = re.compile(r"^  (private(\[graft\])? )?(def|val|lazy val) ")
while i < n - 1:  # last line is the object's closing brace
    l = lines[i]
    if l.startswith("  /**") or member_re.match(l) or l.startswith("  //"):
        starts.append(i)
        # skip to the end of this member: next blank line at depth 0?
        # members are separated by blank lines in this file; a member
        # block runs until the next start candidate preceded by blank
        i += 1
        while i < n - 1:
            if (lines[i].startswith("  /**") or member_re.match(lines[i])
                    or lines[i].startswith("  //")) and lines[i - 1].strip() == "":
                break
            i += 1
    else:
        i += 1

blocks = []
last = n - 1
while lines[last].strip() == "":
    last -= 1
assert lines[last] == "}", "object closer expected"
for k, s in enumerate(starts):
    e = starts[k + 1] - 1 if k + 1 < len(starts) else last - 1
    body = "\n".join(lines[s:e + 1]).rstrip("\n")
    # member name: first def/val in the block
    m = re.search(r"^  (?:private(?:\[graft\])? )?(?:def|val|lazy val) ([A-Za-z0-9_]+)",
                  body, re.M)
    blocks.append((m.group(1) if m else f"__anon{k}", body))

# ---- builder name -> query name ------------------------------------
builder_of = {}
for qname, entry in q_entries:
    m = re.search(r"\(([A-Za-z0-9_]+) _\)", entry)
    if m:
        builder_of[qname] = m.group(1)

stats_builders = {builder_of[q] for q in STATS if q in builder_of} | FORCE_STATS
graph_builders = {builder_of[q] for q in GRAPH if q in builder_of} | FORCE_GRAPH

# oracle entries may reference helper members: include member blocks
# whose name appears in a moved oracle entry (e.g. kCoreOracle)
def oracle_refs(qset):
    refs = set()
    for qname, entry in o_entries:
        if qname in qset:
            for m in re.finditer(r"\b([a-zA-Z][A-Za-z0-9_]*)\b", entry):
                refs.add(m.group(1))
    return refs

stats_refs = oracle_refs(STATS)
graph_refs = oracle_refs(GRAPH)
core_qnames = {q for q, _ in q_entries if q not in STATS and q not in GRAPH}
core_refs = oracle_refs(core_qnames)
block_names = {name for name, _ in blocks}
# move an oracle helper only if NO core oracle also references it —
# shelves see core (they extend it) but core cannot see a shelf
stats_builders |= (stats_refs & block_names) - core_refs
graph_builders |= (graph_refs & block_names) - core_refs

stats_blocks = [b for b in blocks if b[0] in stats_builders]
graph_blocks = [b for b in blocks if b[0] in graph_builders]
core_blocks = [b for b in blocks
               if b[0] not in stats_builders and b[0] not in graph_builders]

def map_src(name, typ, entries, qset):
    kept = [e for q, e in entries if q in qset]
    return (f"  private[graft] def {name}: {typ} = Map(\n"
            + "\n".join(kept) + "\n  )")

Q_T = "Map[String, (SparkSession, String) => DataFrame]"
O_T = "Map[String, String]"

core_q = [(q, e) for q, e in q_entries if q not in STATS and q not in GRAPH]
core_o = [(q, e) for q, e in o_entries if q not in STATS and q not in GRAPH]

def trait_file(trait, doc, qmap, omap, blks, qset):
    body = "\n\n".join(b for _, b in blks)
    return f"""{header}
/** {doc}
  * Split from AnalyticsRegistry (round 14); member bodies are
  * unchanged — this trait is mixed back into the same object, so
  * every reference resolves exactly as before.
  */
private[graft] trait {trait} extends AnalyticsCore {{

{map_src(qmap, Q_T, q_entries, qset)}

{map_src(omap, O_T, o_entries, qset)}

{body}
}}
"""

stats_src = trait_file(
    "AnalyticsStatsShelf",
    "Statistics / experimentation / ML-evaluation shelf — query builders plus their DuckDB oracles.",
    "statsQueries", "statsOracleSql", stats_blocks, STATS)
graph_src = trait_file(
    "AnalyticsGraphShelf",
    "Graph analytics shelf (pagerank, triangles, k-core, link prediction, join forecast) — query builders plus their DuckDB oracles.",
    "graphQueries", "graphOracleSql", graph_blocks, GRAPH)

core_body = "\n\n".join(b for _, b in core_blocks)
core_src = f"""{header}
/** OLAP / event / time-series queries over the TPC-H-ish tables — query builders plus their DuckDB oracles.
  * Conventions: see [[graft.SparkEntry]]. Core shelf of the round-14
  * three-way split; member bodies are unchanged.
  */
private[graft] trait AnalyticsCore {{

{map_src("coreQueries", Q_T, core_q, {q for q, _ in core_q})}

{map_src("coreOracleSql", O_T, core_o, {q for q, _ in core_o})}

{core_body}
}}

/** The assembled analytics registry: core + stats + graph shelves. */
private[graft] object AnalyticsRegistry
    extends AnalyticsCore with AnalyticsStatsShelf with AnalyticsGraphShelf {{

  def queries: {Q_T} =
    coreQueries ++ statsQueries ++ graphQueries

  def oracleSql: {O_T} =
    coreOracleSql ++ statsOracleSql ++ graphOracleSql
}}
"""

open(SRC, "w").write(core_src)
open("src/main/scala/graft/registry/AnalyticsStatsShelf.scala", "w").write(stats_src)
open("src/main/scala/graft/registry/AnalyticsGraphShelf.scala", "w").write(graph_src)
print(f"core blocks={len(core_blocks)} stats={len(stats_blocks)} graph={len(graph_blocks)}")
print(f"core q={len(core_q)} stats q={len([q for q,_ in q_entries if q in STATS])} graph q={len([q for q,_ in q_entries if q in GRAPH])}")
