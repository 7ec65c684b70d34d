package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Cross-source near-duplication matrix
  * ([[Dedup.crossSourceDupMatrix]]).
  */
class CrossSourceDupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seven wizards brew strong potions under a pale moon"
  private val other = "completely different content about compilers " +
    "lexers parsers abstract syntax trees and register allocation"

  // A: docs 1, 3, 4, 5; B: docs 2, 6.
  //   1 (A) == 2 (B)   cross-source duplicate
  //   3 (A) == 4 (A)   within-source duplicate
  //   5 (A), 6 (B)     unique
  private def docs = df(schema, Seq(
    Row(1L, base, "A"),
    Row(2L, base, "B"),
    Row(3L, other, "A"),
    Row(4L, other, "A"),
    Row(5L, base.replace("fox", "cat").replace("wizards", "bakers")
      .replace("moon", "sun").replace("potions", "coffee"), "A"),
    Row(6L, other.replace("compilers", "gardens")
      .replace("parsers", "tulips").replace("register", "water"), "B")))

  private def matrix = Dedup
    .crossSourceDupMatrix(docs, "doc_id", "text", "source")
    .collect()
    .map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    .toMap

  test("cross-source pairs land in both directed cells with the " +
      "unordered pair counted once per cell") {
    val m = matrix
    assert(m(("A", "B")) == ((1L, 1L, 4L, 0.25)))
    assert(m(("B", "A")) == ((1L, 1L, 2L, 0.5)))
  }

  test("within-source duplicates land on the diagonal, un-doubled, " +
      "with both members counted as dup docs") {
    val m = matrix
    assert(m(("A", "A")) == ((1L, 2L, 4L, 0.5)))
    assert(!m.contains(("B", "B")))
  }

  test("unique documents contribute to totals only") {
    val m = matrix
    // doc 5 and 6 never appear as dup docs, but n_docs includes them
    assert(m(("A", "B"))._3 == 4L)
    assert(m(("B", "A"))._3 == 2L)
  }

  test("a corpus with no near-dups yields an empty matrix") {
    val uniq = df(schema, Seq(
      Row(1L, base, "A"),
      Row(2L, other, "B")))
    assert(Dedup.crossSourceDupMatrix(uniq, "doc_id", "text", "source")
      .count() == 0L)
  }
}
