#!/usr/bin/env python3
"""Round-16 mechanical splitter for operators/AnalyticsStatsOps.scala
(2,880 lines — at the repo's ~3,000-line guideline): carves the
time-series / sequential-monitoring operator family (cross-correlation,
mSPRT, CUSUM, change-point, seasonal profile, Holt + its private fold
helpers, Theil-Sen, the bucket-grid ACF/Ljung-Box/burstiness cluster)
into a sibling trait AnalyticsTimeSeriesOps mixed into the same
`object Analytics`, so every member body stays byte-identical and all
`Analytics.x` references keep resolving. Zero behavior change
intended; CORRECTNESS hashes must not move.
"""
import re

SRC = "src/main/scala/graft/operators/AnalyticsStatsOps.scala"
OUT = "src/main/scala/graft/operators/AnalyticsTimeSeriesOps.scala"

MOVE_DEFS = {
    "crossCorrelation", "msprtMonitor", "cusumShift",
    "cusumFixedTarget", "changePoint", "seasonalProfile",
    "holtForecast", "holtResume", "holtSeries", "holtFold", "holtEmit",
    "theilSenTrend", "bucketCounts", "autocorrelation", "acfRaw",
    "ljungBox", "burstiness",
}

HEADER = '''package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / sequential-monitoring operator shelf — the
  * cross-correlation, mSPRT, CUSUM, change-point, seasonal-profile,
  * Holt, Theil-Sen and bucket-grid ACF/Ljung-Box/burstiness
  * operators. Split from [[AnalyticsStatsOps]] (round 16); member
  * bodies are unchanged — this trait is mixed back into the same
  * [[Analytics]] object, so every `Analytics.x` reference resolves
  * exactly as before.
  */
private[graft] trait AnalyticsTimeSeriesOps { this: Analytics.type =>
'''

lines = open(SRC).read().split("\n")

# find trait opening line
topen = None
for i, ln in enumerate(lines):
    if ln.startswith("private[graft] trait AnalyticsStatsOps"):
        topen = i
        break
assert topen is not None

# index of the trait's closing `}` (last non-empty line)
tclose = len(lines) - 1
while lines[tclose].strip() != "}":
    tclose -= 1

# member starts: `  /**` scaladoc openers or bare `  def `/`  private def `
starts = []
for j in range(topen + 1, len(lines)):
    if re.match(r"^  /\*\*", lines[j]) or re.match(
            r"^  (private )?(def|val) ", lines[j]):
        starts.append(j)
real_starts = []
for j in starts:
    if re.match(r"^  (private )?(def|val) ", lines[j]):
        k = j - 1
        while k >= 0 and lines[k].strip() == "":
            k -= 1
        if k >= 0 and lines[k].strip().endswith("*/"):
            continue  # part of the scaladoc block already recorded
    real_starts.append(j)

named = []
for idx, j in enumerate(real_starts):
    end = real_starts[idx + 1] if idx + 1 < len(real_starts) else tclose
    name = None
    for k in range(j, end):
        m = re.match(r"^  (?:private )?(?:def|val) (\w+)", lines[k])
        if m:
            name = m.group(1)
            break
    named.append((j, end, name))

keep, move = [], []
for j, end, name in named:
    block = lines[j:end]
    while block and block[-1].strip() == "":
        block.pop()
    (move if name in MOVE_DEFS else keep).append(block)

moved = [n for _, _, n in named if n in MOVE_DEFS]
assert sorted(moved) == sorted(MOVE_DEFS), (
    sorted(set(MOVE_DEFS) - set(moved)), sorted(set(moved) - set(MOVE_DEFS)))

# rebuild source file: header through trait-open unchanged, then kept
# members, closing brace
out_src = lines[:topen + 1]
for b in keep:
    out_src.append("")
    out_src.extend(b)
out_src.append("}")
out_src.append("")

out_new = HEADER.split("\n")
for b in move:
    out_new.append("")
    out_new.extend(b)
out_new.append("}")
out_new.append("")

open(SRC, "w").write("\n".join(out_src))
open(OUT, "w").write("\n".join(out_new))
print(f"kept {len(keep)} members, moved {len(move)}")
