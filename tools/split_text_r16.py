#!/usr/bin/env python3
"""Round-16 split: carve the retrieval family (BM25 / Dirichlet-QL /
Rocchio / eval oracles and their queries) out of TextRegistry.scala
(3,044 lines, over the ~3,000 guideline) into a TextRetrievalShelf
trait mixed back into the same object — the AnalyticsRegistry shelf
pattern. Member bodies are UNCHANGED; every oracle string renders
byte-identically, so all 327 hashes are untouched.
"""
import re

SRC = "src/main/scala/graft/registry/TextRegistry.scala"
DST = "src/main/scala/graft/registry/TextRetrievalShelf.scala"

MOVED_QUERIES = [
    "q171_bm25_search", "q176_bm25_incremental", "q246_retrieval_eval",
    "q259_retrieval_macro", "q294_dirichlet_ql", "q324_rocchio_prf",
    "q326_smoothing_ab",
]
MOVED_DEFS = [
    "bm25SearchQ", "bm25IncrementalQ", "retrievalEvalQ",
    "retrievalMacroQ", "dirichletQlQ", "rocchioPrfQ", "smoothingAbQ",
]
MOVED_VALS = [
    "oracleBm25Sql", "oracleDirichletQlSql",
]
MOVED_HELPERS = [
    "oracleRetrievalEvalSql", "oracleRetrievalEvalSqlFor",
]

src = open(SRC).read()


def take_block(text, start_pat):
    """Extract a top-level member block: from the line matching
    start_pat (including its preceding scaladoc, if contiguous) to
    the line before the next top-level member or map entry."""
    lines = text.split("\n")
    idx = None
    for i, l in enumerate(lines):
        if re.match(start_pat, l):
            idx = i
            break
    assert idx is not None, start_pat
    # include contiguous preceding scaladoc/comment lines
    s = idx
    while s > 0 and (lines[s - 1].lstrip().startswith("*") or
                     lines[s - 1].lstrip().startswith("/**") or
                     lines[s - 1].lstrip().startswith("//") or
                     lines[s - 1].lstrip().startswith("*/")):
        s -= 1
    # find end: next top-level member at 2-space indent
    e = idx + 1
    depth = None
    while e < len(lines):
        l = lines[e]
        if re.match(r"^  (private\[graft\] |def |val )", l) and \
                not lines[e - 1].rstrip().endswith(("(", ",", "=>", "=", "+")):
            # candidate boundary: check it's not inside the block by
            # brace balance from idx
            body = "\n".join(lines[s:e])
            if body.count("{") == body.count("}") and \
                    body.count("(") == body.count(")"):
                break
        e += 1
    return "\n".join(lines[s:e]), s, e


# 1) pull map entries for moved queries out of the queries map
for q in MOVED_QUERIES:
    pat = re.compile(r'[ ]*"%s" -> \([a-zA-Z0-9]+ _\),\n' % q)
    assert pat.search(src), q
    src = pat.sub("", src, count=1)

# 2) pull oracle entries (span from `"qNNN" ->` to the next entry at
# the same indent) — handle both string and block forms
oracle_entries = {}
for q in MOVED_QUERIES:
    m = re.search(
        r'(    // [^\n]*\n(?:    // [^\n]*\n)*)?    "%s" ->' % q, src)
    assert m, q
    start = m.start()
    # find the end: scan forward for the next `    "q` at indent 4 or
    # the closing `  )` of the map
    tail = src[start + 4:]
    m2 = re.search(r'\n    "q\d+_', tail)
    m3 = re.search(r'\n  \)\n', tail)
    end = start + 4 + (m2.start() if m2 and
                       (not m3 or m2.start() < m3.start())
                       else m3.start())
    oracle_entries[q] = src[start:end].rstrip("\n") + "\n"
    src = src[:start] + src[end + 1:]

# 3) move the shared vals/helpers (block extraction)
moved_blocks = []
for name in MOVED_VALS:
    block, s, e = take_block(src, r"^  private\[graft\] val %s" % name)
    moved_blocks.append(block)
    lines = src.split("\n")
    src = "\n".join(lines[:s] + lines[e:])
for name in MOVED_HELPERS:
    block, s, e = take_block(src, r"^  private\[graft\] def %s" % name)
    moved_blocks.append(block)
    lines = src.split("\n")
    src = "\n".join(lines[:s] + lines[e:])
for name in MOVED_DEFS:
    block, s, e = take_block(
        src, r"^  private\[graft\] def %s\(" % name)
    moved_blocks.append(block)
    lines = src.split("\n")
    src = "\n".join(lines[:s] + lines[e:])

# 4) rewrite the object header to mix in the trait and merge maps
src = src.replace(
    "private[graft] object TextRegistry {",
    "private[graft] object TextRegistry extends TextRetrievalShelf {")
src = src.replace(
    "  def queries: Map[String, (SparkSession, String) => DataFrame]"
    " = Map(",
    "  def queries: Map[String, (SparkSession, String) => DataFrame]"
    " =\n    retrievalQueries ++ Map(")
src = src.replace(
    "  def oracleSql: Map[String, String] = Map(",
    "  def oracleSql: Map[String, String] =\n"
    "    retrievalOracleSql ++ Map(")

open(SRC, "w").write(src)

entries = "\n".join(
    '    "%s" -> (%s _),' % (q, d)
    for q, d in zip(MOVED_QUERIES, MOVED_DEFS))
oracles = ",\n".join(
    oracle_entries[q].rstrip(",\n").rstrip() for q in MOVED_QUERIES)

shelf = '''package graft.registry

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Retrieval-family shelf — BM25 (from-scratch and over the standing
  * index), Dirichlet-QL, Rocchio PRF, the ranked-retrieval eval
  * chain and the smoothing A/B, plus their shared DuckDB oracle
  * builders. Split from [[TextRegistry]] (round 16, file at 3,044
  * lines); member bodies are unchanged — the trait mixes back into
  * the same object, so every reference and every oracle string
  * renders exactly as before.
  */
private[graft] trait TextRetrievalShelf {

  private[graft] def retrievalQueries:
      Map[String, (SparkSession, String) => DataFrame] = Map(
%s
  )

%s

  private[graft] def retrievalOracleSql: Map[String, String] = Map(
%s,
  )
}
''' % (entries, "\n\n".join(moved_blocks), oracles)

open(DST, "w").write(shelf)
print("TextRegistry ->", len(src.split(chr(10))), "lines;",
      "shelf ->", len(shelf.split(chr(10))), "lines")
