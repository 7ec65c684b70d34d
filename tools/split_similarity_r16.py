#!/usr/bin/env python3
"""Round-16 mechanical splitter for registry/SimilarityRegistry.scala
(2,593 lines and growing; VERDICT r15 task 4): carves the multimodal
family (binary fingerprints, PNG/JPEG/WebP header decodes, pixel/WAV
roundtrips, video meta, image dHash pairs, audio energy-hash dedup)
into a sibling MultimodalRegistry object concatenated into SparkEntry,
so every member body stays byte-identical. Zero behavior change
intended; CORRECTNESS hashes must not move.
"""
import re

SRC = "src/main/scala/graft/registry/SimilarityRegistry.scala"
OUT = "src/main/scala/graft/registry/MultimodalRegistry.scala"

MOVE_Q = {
    "q30_binary_fingerprints", "q38_png_header_decode",
    "q256_jpeg_header_decode", "q270_jpeg_real_roundtrip",
    "q39_image_pixel_stats", "q47_wav_roundtrip", "q63_video_meta",
    "q122_image_dhash_pairs", "q169_audio_ehash_dedup",
}
MOVE_DEFS = [
    "binaryFingerprints", "pngHeaderDecode", "jpegHeaderDecode",
    "jpegRealRoundtrip", "imagePixelStats", "wavRoundtrip",
    "videoMeta", "imageDHashPairs", "audioEhashDedupQ",
]

HEADER = '''package graft.registry

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Multimodal (image / audio / video binary column) queries — query
  * builders plus their DuckDB oracles. Split from
  * [[SimilarityRegistry]] (round 16); member bodies are unchanged.
  * Conventions: see [[graft.SparkEntry]].
  */
private[graft] object MultimodalRegistry {
'''

lines = open(SRC).read().split("\n")


def find(pat, start=0):
    for i in range(start, len(lines)):
        if re.match(pat, lines[i]):
            return i
    raise SystemExit(f"not found: {pat}")


qmap_start = find(r"^  def queries")
qmap_end = find(r"^  \)$", qmap_start)
keep_qlines, move_qlines = [], []
for ln in lines[qmap_start + 1:qmap_end]:
    m = re.search(r'"(q\d+_\w+)"', ln)
    (move_qlines if m and m.group(1) in MOVE_Q else keep_qlines).append(ln)

omap_start = find(r"^  def oracleSql", qmap_end)
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
assert len(move_entries) == len(MOVE_Q), (
    f"oracle coverage: moved {len(move_entries)} of {len(MOVE_Q)}")

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
    # the very last member slice carries the object's closing brace
    if end == len(lines) - 1 and block and block[-1] == "}":
        block.pop()
        while block and block[-1].strip() == "":
            block.pop()
    (move_defs if name in MOVE_DEFS else keep_defs).append(block)

moved_names = [n for _, _, n in named if n in MOVE_DEFS]
assert sorted(moved_names) == sorted(MOVE_DEFS), (
    f"def coverage mismatch: {sorted(moved_names)}")

out = [HEADER]
out.append("  def queries: "
           "Map[String, (SparkSession, String) => DataFrame] = Map(")
out.extend(move_qlines)
out.append("  )")
out.append("")
out.append("  def oracleSql: Map[String, String] = Map(")
for b in move_entries:
    out.append("\n".join(b))
out.append("  )")
out.append("")
for b in move_defs:
    out.append("\n".join(b))
    out.append("")
while out and out[-1] == "":
    out.pop()
out.append("}")
open(OUT, "w").write("\n".join(out) + "\n")

new = []
new.extend(lines[:qmap_start + 1])
new.extend(keep_qlines)
new.append("  )")
new.append("")
new.append("  def oracleSql: Map[String, String] = Map(")
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
