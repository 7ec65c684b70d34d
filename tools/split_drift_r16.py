#!/usr/bin/env python3
"""Round-16 second-wave mechanical splitter for
registry/AnalyticsDriftShelf.scala (2,883 lines — at the repo's
~3,000-line guideline): carves the time-series / monitoring family
(CUSUM, change-point, mSPRT, seasonal profile/decompose/MK, ACF,
burstiness, Holt, Theil-Sen, Mann-Kendall, Page-Hinkley, runs,
Durbin-Watson, Ljung-Box, Gumbel) into a sibling trait
AnalyticsTimeSeriesShelf mixed back into the same AnalyticsRegistry
object, leaving the two-sample drift tests and panels in place.
Member bodies stay byte-identical; CORRECTNESS hashes must not move.
"""
import re

SRC = "src/main/scala/graft/registry/AnalyticsDriftShelf.scala"
OUT = "src/main/scala/graft/registry/AnalyticsTimeSeriesShelf.scala"

MOVE_Q = {
    "q194_cusum_shift", "q195_seasonal_dow", "q205_cusum_monitor",
    "q206_change_point", "q215_msprt_monitor", "q244_event_acf",
    "q245_event_burstiness", "q265_holt_forecast", "q268_holt_resume",
    "q269_theil_sen_trend", "q285_mann_kendall", "q286_page_hinkley",
    "q302_seasonal_mk", "q304_runs_test", "q309_durbin_watson",
    "q318_seasonal_decompose", "q321_gumbel_maxima",
    "q327_gumbel_store", "q328_ljung_box",
}
MOVE_DEFS = {
    "cusumShiftQ", "seasonalDowQ", "cusumFixedQ", "changePointQ",
    "msprtQ", "eventAcfQ", "eventBurstinessQ", "holtForecastQ",
    "holtResumeQ", "theilSenQ", "mannKendallQ", "pageHinkleyQ",
    "seasonalMkQ", "runsTestQ", "durbinWatsonQ", "seasonalDecomposeQ",
    "gumbelMaximaQ", "gumbelStoreQ", "ljungBoxQ", "oracleHoltSql",
}

HEADER = '''package graft.registry

import graft.functions.Fx
import graft.operators.Analytics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Time-series / monitoring shelf — the CUSUM, change-point, mSPRT,
  * seasonal (profile / decompose / Mann-Kendall), ACF, burstiness,
  * Holt, Theil-Sen, Mann-Kendall, Page-Hinkley, runs, Durbin-Watson,
  * Ljung-Box and Gumbel queries plus their DuckDB oracles. Split from
  * [[AnalyticsDriftShelf]] (round 16 second wave); member bodies are
  * unchanged — this trait is mixed back into the same
  * [[AnalyticsRegistry]] object, so every reference resolves exactly
  * as before. Conventions: see [[graft.SparkEntry]].
  */
private[graft] trait AnalyticsTimeSeriesShelf extends AnalyticsCore {
'''

lines = open(SRC).read().split("\n")


def find(pat, start=0):
    for i in range(start, len(lines)):
        if re.match(pat, lines[i]):
            return i
    raise SystemExit(f"not found: {pat}")


# ---- driftQueries map: split entry lines -------------------------- #
qmap_start = find(r"^  private\[graft\] def driftQueries")
qmap_end = find(r"^  \)$", qmap_start)
keep_qlines, move_qlines = [], []
for ln in lines[qmap_start + 1:qmap_end]:
    m = re.search(r'"(q\d+_\w+)"', ln)
    (move_qlines if m and m.group(1) in MOVE_Q else keep_qlines).append(ln)

# ---- oracleHoltSql val (moves whole, with its scaladoc) ----------- #
holt_doc = find(r"^  /\*\* Shared Holt recursion oracle")
holt_end = find(r"^  private\[graft\] def driftOracleSql", holt_doc)
holt_block = lines[holt_doc:holt_end]
while holt_block and holt_block[-1].strip() == "":
    holt_block.pop()

# ---- driftOracleSql map: split entries ----------------------------- #
omap_start = holt_end
omap_close = find(r"^  \)$", omap_start)
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

moved_onames = [n for _, n in entry_starts if n in MOVE_Q]
assert sorted(moved_onames) == sorted(MOVE_Q), (
    sorted(set(MOVE_Q) - set(moved_onames)))

# ---- builder defs: member blocks ---------------------------------- #
tail_start = omap_close + 1
starts = []
for j in range(tail_start, len(lines)):
    if re.match(r"^  /\*\*", lines[j]) or re.match(
            r"^  private(\[graft\])? (def|val) ", lines[j]):
        starts.append(j)
real_starts = []
for j in starts:
    if re.match(r"^  private", lines[j]):
        k = j - 1
        while k >= 0 and lines[k].strip() == "":
            k -= 1
        if k >= 0 and lines[k].strip().endswith("*/"):
            continue
    real_starts.append(j)

tclose = len(lines) - 1
while lines[tclose].strip() != "}":
    tclose -= 1

named = []
for idx, j in enumerate(real_starts):
    end = real_starts[idx + 1] if idx + 1 < len(real_starts) else tclose
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
want_defs = MOVE_DEFS - {"oracleHoltSql"}  # holt val handled separately
assert sorted(moved_names) == sorted(want_defs), (
    sorted(set(want_defs) - set(moved_names)),
    sorted(set(moved_names) - set(want_defs)))

# ---- rebuild the kept file ----------------------------------------- #
out_src = lines[:qmap_start + 1]
out_src.extend(keep_qlines)
out_src.append("  )")
out_src.append("")
out_src.append(lines[omap_start])
for b in keep_entries:
    out_src.extend(b)
out_src.append("  )")
for b in keep_defs:
    out_src.append("")
    out_src.extend(b)
out_src.append("}")
out_src.append("")

# ---- build the new file -------------------------------------------- #
out_new = HEADER.split("\n")
out_new.append("  private[graft] def tsQueries: "
               "Map[String, (SparkSession, String) => DataFrame] = Map(")
out_new.extend(move_qlines)
out_new.append("  )")
out_new.append("")
out_new.extend(holt_block)
out_new.append("")
out_new.append("  private[graft] def tsOracleSql: Map[String, String] = Map(")
for b in move_entries:
    out_new.extend(b)
out_new.append("  )")
for b in move_defs:
    out_new.append("")
    out_new.extend(b)
out_new.append("}")
out_new.append("")

open(SRC, "w").write("\n".join(out_src))
open(OUT, "w").write("\n".join(out_new))
print(f"queries kept {len(keep_qlines)} / moved {len(move_qlines)}; "
      f"oracles kept {len(keep_entries)} / moved {len(move_entries)}; "
      f"defs kept {len(keep_defs)} / moved {len(move_defs)}")
