package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cluster-merge survivorship ([[Dedup.mergeSurvivorship]]). */
class MergeSurvivorshipSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("src", StringType),
    StructField("score", DoubleType),
    StructField("tok", LongType)))

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seven wizards brew strong potions under a pale moon"
  private val other = "completely different content about compilers " +
    "lexers parsers abstract syntax trees and register allocation"

  // cluster {1,2,3}: identical text, three sources, best score on 2;
  // 4 is a singleton
  private def docs = df(schema, Seq(
    Row(1L, base, "A", 0.5, 10L),
    Row(2L, base, "B", 0.9, 11L),
    Row(3L, base, "A", 0.9, 12L),
    Row(4L, other, "C", 0.7, 20L)))

  private def merged = Dedup.mergeSurvivorship(docs, "doc_id", "text",
      "score", setCols = Seq("src"), sumCols = Seq("tok"))
    .collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getString(4), r.getLong(5)))).toMap

  test("a cluster collapses to one record: min-id label, argmax-score " +
      "keep with min-id tie-break, provenance union, token mass") {
    val m = merged
    assert(m.keySet == Set(1L, 4L))
    val (kept, n, best, srcs, tok) = m(1L)
    assert(kept == 2L) // 0.9 tie between 2 and 3 -> min id
    assert(n == 3L)
    assert(best == 0.9)
    assert(srcs == "A,B") // sorted distinct union
    assert(tok == 33L)
  }

  test("singletons survive as their own cluster with n_members 1") {
    assert(merged(4L) == ((4L, 1L, 0.7, "C", 20L)))
  }

  test("consolidation preserves total corpus token mass — nothing " +
      "drops, unlike keep-best row dedup") {
    val total = Dedup.mergeSurvivorship(docs, "doc_id", "text",
        "score", sumCols = Seq("tok"))
      .agg(sum("sum_tok")).head().getLong(0)
    assert(total == 53L)
  }

  test("kept_id agrees with dedupNearKeepBest's surviving rows") {
    val keepBest = Dedup.dedupNearKeepBest(docs, "doc_id", "text",
        "score")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptIds = Dedup.mergeSurvivorship(docs, "doc_id", "text",
        "score")
      .select("kept_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == keepBest)
  }
}
