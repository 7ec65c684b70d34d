package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TextAnalysis.bpeTrainMerges]] — distributed BPE merge-table
  * induction (frequency-weighted pair counts, deterministic argmax,
  * greedy left-to-right merge).
  */
class BpeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("text", StringType)))

  private def corpus(texts: String*) =
    df(schema, texts.zipWithIndex.map { case (t, i) => Row(i, t) })

  private def merges(d: org.apache.spark.sql.DataFrame, k: Int) =
    TextAnalysis.bpeTrainMerges(d, "text", k)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("closed-form merge sequence with frequency weighting and the " +
      "count-then-lexicographic tie-break") {
    // 'aaab' appears 3 times: (a,a) counts 2 per occurrence = 6;
    // (a,b) = 3. After merging (a,a): [aa, a, b] → (aa,a)=3 ties
    // (a,b)=3 → lhs 'a' < 'aa' picks (a,b) → [aa, ab] → (aa,ab)=3.
    val got = merges(corpus("aaab aaab", "aaab"), 3)
    assert(got.toSeq == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("greedy left-to-right, non-overlapping: 'aaaa' merges to " +
      "[aa][aa], then to one token") {
    val got = merges(corpus("aaaa"), 2)
    assert(got.toSeq == Seq(
      (1, "a", "a", "aa", 3L),   // 3 adjacent (a,a) pairs counted
      (2, "aa", "aa", "aaaa", 1L)))
  }

  test("training stops early when no pairs remain (single-char " +
      "vocabulary)") {
    val got = merges(corpus("a b", "b a"), 5)
    // only pair ever: none within 1-char words → zero merge rows
    assert(got.isEmpty)
  }

  test("merge table on the real documents is deterministic across " +
      "runs and strictly count-nonincreasing per step prefix") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id").as("id"),
        org.apache.spark.sql.functions.col("text"))
    val a = merges(d, 4)
    val b = merges(d, 4)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 4)
    assert(a.forall(_._5 > 0))
    // merged symbol is always the concatenation, steps are 1..k
    assert(a.forall(m => m._4 == m._2 + m._3))
    assert(a.map(_._1).toSeq == Seq(1, 2, 3, 4))
  }

  test("bpeTokenCounts applies the merge table in step order: each " +
      "merge shrinks counts by its occurrence count, zero-token docs " +
      "survive with zeros") {
    val d = corpus("aaab aaab", "aaab", "", "zz")
    // merges from the closed-form test: (a,a), (a,b), (aa,ab).
    // 'aaab' = 4 chars → [aa,a,b] → [aa,ab] → [aaab]: 1 token.
    // 'zz' → 2 chars, no merge applies → 2 tokens.
    val m = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val got = TextAnalysis.bpeTokenCounts(d, "id", "text", m)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0, 2L, 2L),  // two 'aaab' words → 1 token each
      (1, 1L, 1L),
      (2, 0L, 0L),  // empty doc
      (3, 1L, 2L))) // 'zz' untouched by the merges
    // no merges at all = plain char counts
    val none = TextAnalysis.bpeTokenCounts(d, "id", "text", Nil)
      .orderBy("id").collect().map(_.getLong(2))
    assert(none.toSeq == Seq(8L, 4L, 0L, 2L))
  }

  // ---- production apply (broadcast rank table + mapPartitions) ----

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.orderBy("id").collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1), r.getLong(2)))
      .toSeq

  test("bpeTokenCountsFast matches the expression path row-for-row " +
      "on the closed-form corpus") {
    val d = corpus("aaab aaab", "aaab", "", "zz")
    val m = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    assert(rows(TextAnalysis.bpeTokenCountsFast(d, "id", "text", m)) ==
      rows(TextAnalysis.bpeTokenCounts(d, "id", "text", m)))
    assert(rows(TextAnalysis.bpeTokenCountsFast(d, "id", "text", Nil)) ==
      rows(TextAnalysis.bpeTokenCounts(d, "id", "text", Nil)))
  }

  test("bpeTokenCountsFast matches the expression path on the real " +
      "documents corpus under a trained 12-merge table") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id").as("id"),
        org.apache.spark.sql.functions.col("text"))
    val m = TextAnalysis.bpeTrainMerges(d, "text", 12)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m.nonEmpty)
    assert(rows(TextAnalysis.bpeTokenCountsFast(d, "id", "text", m)) ==
      rows(TextAnalysis.bpeTokenCounts(d, "id", "text", m)))
  }

  test("STEP-ORDER fidelity: an earlier-rank pair whose left symbol " +
      "is only CREATED by a later merge is not retroactively applied " +
      "(the monotone floor; floor-less rank-priority would merge it)") {
    // rank 0: (ab, c) — 'ab' does not exist at char stage, so the
    // sequential pass 0 is a no-op; rank 1: (a, b) creates 'ab'.
    // Sequential/fold semantics: 'abc' → [a,b,c] →(pass0 no-op)
    // →(pass1) [ab, c] = 2 tokens. Rank-priority without the floor
    // would then see (ab, c) at rank 0 and collapse to 1 token.
    val d = corpus("abc")
    val m = Seq(("ab", "c"), ("a", "b"))
    assert(rows(TextAnalysis.bpeTokenCounts(d, "id", "text", m)) ==
      Seq((0, 1L, 2L)))
    assert(rows(TextAnalysis.bpeTokenCountsFast(d, "id", "text", m)) ==
      Seq((0, 1L, 2L)))
  }

  test("bpeTokenCountsFast applies a 5000-merge table without plan " +
      "failure (the expression path's plan grows per merge; this one " +
      "is constant-size)") {
    // chain table: a+a, aa+a, aaa+a, … — 5000 distinct pairs.
    val chain = ("a", "a") +: (2 to 5000).map(i => ("a" * i, "a"))
    val d = corpus("a" * 64 + " " + "a" * 7, "bcd")
    // 'a'*64: pass (a,a) → 32 'aa' symbols; no (aa,*) pair in the
    // table (chain lefts are a, aa, aaa…, rights all 'a') — wait:
    // (aa, a) IS in the table but no lone 'a' remains. 32 tokens.
    // 'a'*7: [aa,aa,aa,a] → (aa,a)? adjacency (aa,a) present → rank 1
    // merges it → [aa,aa,aaa] → no further pair. 3 tokens.
    val got = rows(TextAnalysis.bpeTokenCountsFast(d, "id", "text", chain))
    assert(got == Seq((0, 2L, 35L), (1, 1L, 3L)))
    // duplicate pairs are rejected up front
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeTokenCountsFast(d, "id", "text",
        Seq(("a", "a"), ("a", "a")))
    }
  }
}
