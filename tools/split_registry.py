#!/usr/bin/env python3
"""One-shot mechanical splitter for SparkEntry.scala: moves the query
builders and oracle SQL into per-domain registry files under
src/main/scala/graft/registry/, leaving SparkEntry as the thin driver
contract (entry + concatenated maps). Zero behavior change intended —
every member body is emitted byte-identical.
"""
import re
import sys
from collections import defaultdict

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT_DIR = "src/main/scala/graft/registry"

# ---------------------------------------------------------------- #
# Domain assignment per query                                       #
# ---------------------------------------------------------------- #
PARITY = {f"q{i:02d}" for i in range(1, 18)}
ANALYTICS = {
    "q32", "q33", "q34", "q35", "q36", "q37", "q45", "q46", "q48",
    "q52", "q53", "q54", "q55", "q56", "q57", "q75", "q79", "q82",
    "q84", "q85", "q86", "q87", "q88", "q89", "q92", "q93", "q94",
    "q95", "q96", "q97", "q99", "q100", "q101", "q102", "q104",
    "q108", "q111", "q115", "q125", "q129", "q130", "q131", "q132",
    "q136", "q137", "q151", "q154", "q157", "q160", "q161", "q164",
    "q166", "q167", "q168", "q170", "q172", "q174",
}
TEXT = {
    "q18", "q19", "q20", "q43", "q44", "q50", "q58", "q60", "q61",
    "q65", "q69", "q76", "q77", "q80", "q81", "q91", "q98", "q124",
    "q133", "q140", "q142", "q143", "q145", "q147", "q150", "q153",
    "q162", "q163", "q171",
}
DEDUP = {
    "q21", "q22", "q23", "q24", "q25", "q26", "q31", "q51", "q64",
    "q66", "q71", "q74", "q83", "q103", "q106", "q110", "q114",
    "q109", "q118", "q119", "q120", "q121", "q126", "q128", "q134",
    "q135", "q148", "q149", "q152", "q155",
}
SIMILARITY = {
    "q27", "q28", "q29", "q30", "q38", "q39", "q40", "q47", "q63",
    "q72", "q78", "q90", "q105", "q112", "q113", "q116", "q117",
    "q122", "q123", "q127", "q138", "q139", "q141", "q144", "q146",
    "q159", "q169", "q173",
}
SAMPLING = {
    "q41", "q42", "q49", "q59", "q62", "q67", "q68", "q70", "q73",
    "q107", "q156", "q158", "q165",
}

DOMANS = [
    ("ParityRegistry", PARITY),
    ("AnalyticsRegistry", ANALYTICS),
    ("TextRegistry", TEXT),
    ("DedupRegistry", DEDUP),
    ("SimilarityRegistry", SIMILARITY),
    ("SamplingRegistry", SAMPLING),
]


def domain_of(qname):
    prefix = qname.split("_")[0]
    for dom, keys in DOMANS:
        if prefix in keys:
            return dom
    raise SystemExit(f"unassigned query: {qname}")


def main():
    text = open(SRC).read()
    lines = text.split("\n")
    n = len(lines)

    decl_re = re.compile(
        r"^  (?:private(?:\[\w+\])? )?(?:lazy )?(?:def|val) (\w+)")
    decls = []  # (lineno0, name)
    for i, l in enumerate(lines):
        m = decl_re.match(l)
        if m:
            decls.append((i, m.group(1)))

    names = [d[1] for d in decls]
    assert len(set(names)) == len(names), "duplicate member names"

    # map region boundaries
    qmap_i = names.index("queries")
    omap_i = names.index("oracleSql")
    qmap_start = decls[qmap_i][0]
    omap_start = decls[omap_i][0]

    def comment_start(decl_line):
        """Walk back over an attached scaladoc / line-comment block."""
        j = decl_line
        while j > 0:
            prev = lines[j - 1].strip()
            if prev.startswith(("/**", "*", "*/", "//")) and \
                    not prev.startswith("// ---"):
                j -= 1
            else:
                break
        return j

    # member blocks: from attached-comment start to next member's
    # attached-comment start (or map region start)
    blocks = {}  # name -> list of lines
    stops = sorted([d[0] for d in decls] + [qmap_start, omap_start, n])
    for idx, (dl, name) in enumerate(decls):
        if name in ("queries", "oracleSql"):
            continue
        nxt = min(s for s in stops if s > dl)
        start = comment_start(dl)
        end = comment_start(nxt) if nxt < n else nxt
        blk = lines[start:end]
        # strip trailing blank lines and divider comment groups
        while blk and blk[-1].strip() == "":
            blk.pop()
        blk = [b for b in blk if not b.strip().startswith("// ---") and
               not (b.strip().startswith("//") and b.strip().endswith("//")
                    and "---" not in b and b.startswith("  //"))]
        blocks[name] = blk

    member_names = [nm for nm in names if nm not in ("queries", "oracleSql")]

    # --- queries map entries ---------------------------------------
    qentries = {}  # qname -> (builder, line)
    entry_re = re.compile(r'^    "(\w+)" -> \((\w+) _\),?$')
    i = qmap_start + 1
    while not lines[i].startswith("  )"):
        m = entry_re.match(lines[i])
        assert m, f"unparsed queries entry: {lines[i]!r}"
        qentries[m.group(1)] = m.group(2)
        i += 1

    # --- oracleSql map entries -------------------------------------
    oentry_starts = []  # (lineno, qname)
    ostart_re = re.compile(r'^    "(\w+)" ->')
    # find closing ')' of the map: last line that is exactly '  )'
    oclose = None
    for i in range(omap_start + 1, n):
        if lines[i] == "  )":
            oclose = i
            break
        m = ostart_re.match(lines[i])
        if m:
            oentry_starts.append((i, m.group(1)))
    assert oclose, "oracleSql close not found"

    oentries = {}
    bounds = [s for s, _ in oentry_starts] + [oclose]
    for k, (s, qname) in enumerate(oentry_starts):
        e = bounds[k + 1]
        # attach preceding indent-4 comment lines
        while s > omap_start + 1 and lines[s - 1].strip().startswith("//"):
            s -= 1
        if k > 0:
            bounds[k] = s  # shrink previous entry's end
        oentries[qname] = (s, e)
    # recompute with adjusted bounds
    obounds = sorted([v[0] for v in oentries.values()]) + [oclose]
    final_oentries = {}
    for qname, (s, _) in oentries.items():
        e = min(b for b in obounds if b > s)
        blk = lines[s:e]
        while blk and blk[-1].strip() == "":
            blk.pop()
        # ensure trailing comma on last line of each entry
        if not blk[-1].rstrip().endswith(","):
            blk[-1] = blk[-1] + ","
        final_oentries[qname] = blk

    assert set(final_oentries) == set(qentries), (
        set(final_oentries) ^ set(qentries))

    # --- reference graph -------------------------------------------
    special_base = {"t", "events"}
    body_of = {nm: "\n".join(blocks[nm]) for nm in member_names}
    refs = {}
    for nm in member_names:
        rs = set()
        for other in member_names:
            if other == nm or other in special_base:
                continue
            if re.search(r"\b%s\b" % re.escape(other), body_of[nm]):
                rs.add(other)
        refs[nm] = rs

    def closure(roots):
        seen = set()
        todo = [r for r in roots if r in blocks]
        while todo:
            x = todo.pop()
            if x in seen:
                continue
            seen.add(x)
            todo.extend(refs.get(x, ()))
        return seen

    dom_roots = defaultdict(set)
    for qname, builder in qentries.items():
        dom = domain_of(qname)
        dom_roots[dom].add(builder)
        # oracle entry may reference helper vals (string interpolation
        # or computed blocks)
        otext = "\n".join(final_oentries[qname])
        for other in member_names:
            if other in special_base:
                continue
            if re.search(r"\b%s\b" % re.escape(other), otext):
                dom_roots[dom].add(other)

    dom_closure = {d: closure(r) for d, r in dom_roots.items()}

    owner = {}
    for nm in member_names:
        if nm in ("entry",):
            continue
        if nm in special_base:
            owner[nm] = "RegistryBase"
            continue
        doms = [d for d, c in dom_closure.items() if nm in c]
        if len(doms) == 1:
            owner[nm] = doms[0]
        elif len(doms) > 1:
            owner[nm] = "RegistryBase"
        else:
            owner[nm] = None  # unreferenced: entry-only or dead
    # anything referenced from base members must be in base (fixpoint)
    changed = True
    while changed:
        changed = False
        for nm, own in list(owner.items()):
            if own != "RegistryBase":
                continue
            for r in refs.get(nm, ()):
                if owner.get(r) not in (None, "RegistryBase"):
                    owner[r] = "RegistryBase"
                    changed = True
                elif owner.get(r) is None:
                    owner[r] = "RegistryBase"
                    changed = True

    orphans = [nm for nm, o in owner.items() if o is None]
    if orphans:
        print("NOTE unowned members (kept in SparkEntry):", orphans)

    # --- emit -------------------------------------------------------
    header = """package graft.registry

import graft.dedup.Dedup
import graft.functions.Fx
import graft.multimodal.Multimodal
import graft.operators.Analytics
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._
"""
    base_header = """package graft.registry

import graft.dedup.Dedup
import graft.functions.Fx
import graft.multimodal.Multimodal
import graft.operators.Analytics
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
"""

    def widen(blk):
        """private -> private[graft] so cross-object references within
        the graft package tree keep working."""
        return [re.sub(r"^  private (def|val|lazy val) ",
                       r"  private[graft] \1 ", b) for b in blk]

    import os
    os.makedirs(OUT_DIR, exist_ok=True)

    def emit(path, content):
        open(path, "w").write(content)
        print(f"wrote {path} ({len(content.splitlines())} lines)")

    # RegistryBase
    base_members = [nm for nm in member_names if owner.get(nm) == "RegistryBase"]
    body = "\n\n".join("\n".join(widen(blocks[nm])) for nm in base_members)
    emit(f"{OUT_DIR}/RegistryBase.scala", base_header + """
/** Shared helpers for the per-domain query registries: table readers
  * and the oracle-SQL CTE builders used by more than one domain. Split
  * out of the original single-file registry; bodies are unchanged.
  */
private[graft] object RegistryBase {

""" + body + "\n}\n")

    dom_titles = {
        "ParityRegistry": "Reference-parity queries (SURVEY.md §2)",
        "AnalyticsRegistry":
            "OLAP / event / statistics queries over the TPC-H-ish tables",
        "TextRegistry": "Text-analysis, quality and lexical-retrieval queries",
        "DedupRegistry": "Exact and near-duplicate detection queries",
        "SimilarityRegistry":
            "Embedding / ANN / multimodal similarity queries",
        "SamplingRegistry": "Sampling, splits, mixtures and shard packing",
    }
    for dom, _keys in DOMANS:
        members = [nm for nm in member_names if owner.get(nm) == dom]
        qs = sorted([q for q in qentries if domain_of(q) == dom])
        qlines = "\n".join(
            f'    "{q}" -> ({qentries[q]} _),' for q in qs)
        olines = "\n".join("\n".join(final_oentries[q]) for q in qs)
        mbody = "\n\n".join("\n".join(widen(blocks[nm])) for nm in members)
        content = header + f"""
/** {dom_titles[dom]} — query builders plus their DuckDB oracles.
  * Conventions: see [[graft.SparkEntry]]. Split from the original
  * single-file registry; member bodies are unchanged.
  */
private[graft] object {dom} {{

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{qlines}
  )

  def oracleSql: Map[String, String] = Map(
{olines}
  )

{mbody}
}}
"""
        emit(f"{OUT_DIR}/{dom}.scala", content)

    # new SparkEntry
    head_end = comment_start(decls[0][0])  # start of `t` block
    sp_head = "\n".join(lines[:head_end]).rstrip()
    sp_head = sp_head.replace(
        "import org.apache.spark.sql.functions._",
        "import org.apache.spark.sql.functions._\n"
        "import graft.registry.RegistryBase._")
    orphan_body = "\n\n".join("\n".join(blocks[nm]) for nm in orphans)
    entry_block = "\n".join(blocks["entry"])
    entry_block = entry_block.replace(
        "revenueByNation(",
        "graft.registry.ParityRegistry.revenueByNation(")
    regs = [d for d, _ in DOMANS]
    qcat = " ++\n    ".join(f"graft.registry.{d}.queries" for d in regs)
    ocat = " ++\n    ".join(f"graft.registry.{d}.oracleSql" for d in regs)
    sp = sp_head + "\n\n" + entry_block + "\n\n" + (
        orphan_body + "\n\n" if orphan_body else "") + f"""  def queries: Map[String, (SparkSession, String) => DataFrame] =
    {qcat}

  def oracleSql: Map[String, String] =
    {ocat}
}}
"""
    emit(SRC, sp)


if __name__ == "__main__":
    main()
