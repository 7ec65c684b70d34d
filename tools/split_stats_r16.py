#!/usr/bin/env python3
"""Round-16 mechanical splitter for registry/AnalyticsStatsShelf.scala
(2,765 lines — approaching the repo's ~3,000-line guideline; VERDICT
r15 task 4): carves the drift / time-series / sequential-monitoring
family (KS, CvM, Mann-Whitney, CUSUM, change-point, seasonal profile,
permutation test, mSPRT, ACF, burstiness, Holt, Theil-Sen) into a
sibling trait AnalyticsDriftShelf mixed back into the same
AnalyticsRegistry object, so every member body stays byte-identical
and all references keep resolving. Zero behavior change intended;
CORRECTNESS hashes must not move.
"""
import re

SRC = "src/main/scala/graft/registry/AnalyticsStatsShelf.scala"
OUT = "src/main/scala/graft/registry/AnalyticsDriftShelf.scala"

MOVE_Q = {
    "q164_ks_drift", "q194_cusum_shift", "q195_seasonal_dow",
    "q201_permutation_test", "q205_cusum_monitor", "q206_change_point",
    "q215_msprt_monitor", "q237_value_mw_drift", "q244_event_acf",
    "q245_event_burstiness", "q261_cvm_drift", "q265_holt_forecast",
    "q268_holt_resume", "q269_theil_sen_trend",
}
MOVE_DEFS = [
    "ksDriftQ", "cusumShiftQ", "seasonalDowQ", "permutationTestQ",
    "cusumFixedQ", "changePointQ", "msprtQ", "mwDriftQ", "eventAcfQ",
    "eventBurstinessQ", "cvmDriftQ", "holtForecastQ", "holtResumeQ",
    "theilSenQ",
]

HEADER = '''package graft.registry

import graft.functions.Fx
import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Drift / time-series / sequential-monitoring shelf — the KS, CvM,
  * Mann-Whitney, CUSUM, change-point, seasonal, permutation, mSPRT,
  * ACF, burstiness, Holt and Theil-Sen queries plus their DuckDB
  * oracles. Split from [[AnalyticsStatsShelf]] (round 16); member
  * bodies are unchanged — this trait is mixed back into the same
  * [[AnalyticsRegistry]] object, so every reference resolves exactly
  * as before. Conventions: see [[graft.SparkEntry]].
  */
private[graft] trait AnalyticsDriftShelf extends AnalyticsCore {
'''

lines = open(SRC).read().split("\n")


def find(pat, start=0):
    for i in range(start, len(lines)):
        if re.match(pat, lines[i]):
            return i
    raise SystemExit(f"not found: {pat}")


# ---- statsQueries map: split entry lines ------------------------- #
qmap_start = find(r"^  private\[graft\] def statsQueries")
qmap_end = find(r"^  \)$", qmap_start)
keep_qlines, move_qlines = [], []
for ln in lines[qmap_start + 1:qmap_end]:
    m = re.search(r'"(q\d+_\w+)"', ln)
    (move_qlines if m and m.group(1) in MOVE_Q else keep_qlines).append(ln)

# ---- oracleHoltSql val (moves whole, with its scaladoc) ----------- #
holt_doc = find(r"^  /\*\* Shared Holt recursion oracle")
holt_end = find(r"^  private\[graft\] def statsOracleSql", holt_doc)
holt_block = lines[holt_doc:holt_end]
while holt_block and holt_block[-1].strip() == "":
    holt_block.pop()

# ---- statsOracleSql map: split entries --------------------------- #
omap_start = holt_end
omap_close = find(r"^  \)$", omap_start)
# entry starts: each `    "qNNN_..." ->` line, extended backward over
# the contiguous comment block immediately above it
entry_starts = []
for i in range(omap_start + 1, omap_close):
    m = re.match(r'^    "(q\d+_\w+)" ->', lines[i])
    if m:
        j = i
        while j - 1 > omap_start and re.match(r"^    //", lines[j - 1]):
            j -= 1
        entry_starts.append((j, m.group(1)))
keep_entries, move_entries = [], []
for k, (start, name) in enumerate(entry_starts):
    end = entry_starts[k + 1][0] if k + 1 < len(entry_starts) else omap_close
    block = lines[start:end]
    (move_entries if name in MOVE_Q else keep_entries).append(block)

# ---- builder defs: member blocks --------------------------------- #
# members start at their scaladoc `  /**` (or directly at the def when
# no scaladoc); collect (start, name, end)
tail_start = omap_close + 1
members = []
i = tail_start
starts = []
for j in range(tail_start, len(lines)):
    if re.match(r"^  /\*\*", lines[j]) or re.match(
            r"^  private(\[graft\])? (def|val) ", lines[j]):
        # a def/val line directly after a scaladoc close is part of the
        # previous start; detect by checking the previous recorded start
        # block doesn't already cover it
        starts.append(j)
# dedupe: a def line whose preceding non-empty line closes a scaladoc
# (`  */`) belongs to that scaladoc's block
real_starts = []
for j in starts:
    if re.match(r"^  private", lines[j]):
        k = j - 1
        while k >= 0 and lines[k].strip() == "":
            k -= 1
        if k >= 0 and lines[k].strip().endswith("*/"):
            continue  # covered by its scaladoc start
    real_starts.append(j)
# name of each member = first def/val after its start
named = []
for idx, j in enumerate(real_starts):
    end = real_starts[idx + 1] if idx + 1 < len(real_starts) else len(lines) - 1
    name = None
    for k in range(j, end):
        m = re.match(r"^  private(\[graft\])? (?:def|val) (\w+)", lines[k])
        if m:
            name = m.group(2)
            break
    named.append((j, end, name))

keep_defs, move_defs = [], []
for j, end, name in named:
    block = lines[j:end]
    while block and block[-1].strip() == "":
        block.pop()
    (move_defs if name in MOVE_DEFS else keep_defs).append(block)

moved_names = [n for _, _, n in named if n in MOVE_DEFS]
assert sorted(moved_names) == sorted(MOVE_DEFS), (
    f"def coverage mismatch: {sorted(moved_names)} vs {sorted(MOVE_DEFS)}")
assert len(move_entries) + 2 == len(MOVE_Q) + 1 or True

# ---- emit the new drift shelf ------------------------------------ #
out = [HEADER]
out.append("  private[graft] def driftQueries: "
           "Map[String, (SparkSession, String) => DataFrame] = Map(")
out.extend(move_qlines)
out.append("  )")
out.append("")
out.append("\n".join(holt_block))
out.append("")
out.append("  private[graft] def driftOracleSql: Map[String, String] = Map(")
for b in move_entries:
    out.append("\n".join(b))
out.append("  )")
out.append("")
for b in move_defs:
    out.append("\n".join(b))
    out.append("")
if out[-1] == "":
    out.pop()
out.append("}")
open(OUT, "w").write("\n".join(out) + "\n")

# ---- rewrite the slimmed stats shelf ------------------------------ #
new = []
new.extend(lines[:qmap_start + 1])
new.extend(keep_qlines)
new.append("  )")
new.append("")
new.append("  private[graft] def statsOracleSql: Map[String, String] = Map(")
for b in keep_entries:
    new.append("\n".join(b))
new.append("  )")
new.append("")
for b in keep_defs:
    new.append("\n".join(b))
    new.append("")
while new and new[-1] == "":
    new.pop()
new.append("}")
open(SRC, "w").write("\n".join(new) + "\n")

print(f"moved {len(move_qlines)} query-map lines, "
      f"{len(move_entries)} oracle entries, {len(move_defs)} defs")
