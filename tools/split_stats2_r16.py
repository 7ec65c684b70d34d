#!/usr/bin/env python3
"""Round-16 third-wave mechanical splitter: AnalyticsStatsShelf
crossed the ~3,000-line guideline when q339-q342 landed, so the
experimentation / model-evaluation / causal family (ROC, gains, WoE,
kappa, isotonic, CUPED, qini, disparate impact, Shapley/position
attribution, Simpson, Mantel-Haenszel, Breslow-Day, SRM, AP,
threshold scorecard, calibration, Brier) moves into the round's new
AnalyticsInferenceShelf, next to the DiD / Page / t-closeness / UCB1
queries that already live there. Member bodies stay byte-identical;
CORRECTNESS hashes must not move.
"""
import re

SRC = "src/main/scala/graft/registry/AnalyticsStatsShelf.scala"
DST = "src/main/scala/graft/registry/AnalyticsInferenceShelf.scala"

MOVE_Q = {
    "q160_calibration_report", "q188_position_attribution",
    "q192_roc_auc", "q193_gains_lift", "q196_price_woe",
    "q197_quality_kappa", "q199_isotonic_calibration",
    "q200_simpson_screen", "q203_cuped_adjustment",
    "q209_qini_uplift", "q214_disparate_impact",
    "q263_mantel_haenszel", "q271_shapley_attribution",
    "q293_quality_auc", "q320_brier_decomposition",
    "q339_breslow_day", "q340_srm_check", "q341_avg_precision",
    "q342_threshold_scorecard",
}
MOVE_DEFS = {
    "calibrationReportQ", "positionAttributionQ", "rocAucQ",
    "gainsLiftQ", "priceWoeQ", "qualityKappaQ",
    "isotonicCalibrationQ", "simpsonScreenQ", "cupedQ",
    "qiniUpliftQ", "disparateImpactQ", "mantelHaenszelQ", "shapleyQ",
    "qualityAucQ", "brierDecompositionQ", "breslowDayQ", "srmQ",
    "avgPrecisionQ", "thresholdScorecardQ",
}

lines = open(SRC).read().split("\n")


def find(pat, start=0):
    for i in range(start, len(lines)):
        if re.match(pat, lines[i]):
            return i
    raise SystemExit(f"not found: {pat}")


qmap_start = find(r"^  private\[graft\] def statsQueries")
qmap_end = find(r"^  \)$", qmap_start)
keep_qlines, move_qlines = [], []
for ln in lines[qmap_start + 1:qmap_end]:
    m = re.search(r'"(q\d+_\w+)"', ln)
    (move_qlines if m and m.group(1) in MOVE_Q else keep_qlines).append(ln)

omap_start = find(r"^  private\[graft\] def statsOracleSql")
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
assert sorted(moved_names) == sorted(MOVE_DEFS), (
    sorted(set(MOVE_DEFS) - set(moved_names)),
    sorted(set(moved_names) - set(MOVE_DEFS)))

out_src = lines[:qmap_start + 1]
out_src.extend(keep_qlines)
out_src.append("  )")
# keep everything between qmap_end+1 and omap_start (the helper vals)
out_src.extend(lines[qmap_end + 1:omap_start])
out_src.append(lines[omap_start])
for b in keep_entries:
    out_src.extend(b)
out_src.append("  )")
for b in keep_defs:
    out_src.append("")
    out_src.extend(b)
out_src.append("}")
out_src.append("")
open(SRC, "w").write("\n".join(out_src))

# ---- surgery on the destination shelf ------------------------------ #
dst = open(DST).read().split("\n")


def dfind(pat, start=0):
    for i in range(start, len(dst)):
        if re.match(pat, dst[i]):
            return i
    raise SystemExit(f"dst not found: {pat}")


# imports: ensure the moved defs' dependencies are present
imp_end = dfind(r"^import graft\.registry\.RegistryBase")
need = [
    "import graft.functions.Fx",
    "import graft.text.TextAnalysis",
    "import org.apache.spark.sql.expressions.Window",
]
for n in need:
    if n not in dst:
        dst.insert(imp_end, n)
        imp_end += 1

qm = dfind(r"^  private\[graft\] def inferenceQueries")
qe = dfind(r"^  \)$", qm)
dst[qe:qe] = move_qlines

om = dfind(r"^  private\[graft\] def inferenceOracleSql", qe)
oe = dfind(r"^  \)$", om)
flat = []
for b in move_entries:
    flat.extend(b)
dst[oe:oe] = flat

dclose = len(dst) - 1
while dst[dclose].strip() != "}":
    dclose -= 1
ins = []
for b in move_defs:
    ins.append("")
    ins.extend(b)
dst[dclose:dclose] = ins
open(DST, "w").write("\n".join(dst))
print(f"moved {len(move_qlines)} map lines, {len(move_entries)} "
      f"oracle entries, {len(move_defs)} defs")
