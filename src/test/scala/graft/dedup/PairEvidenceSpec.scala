package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Dedup.pairShingleEvidence]] — the "why did these two match"
  * table: for each pair, the topK RAREST shared n-shingles by corpus
  * document frequency, rank ties broken on the shingle text.
  */
class PairEvidenceSpec extends SparkSpec {
  import spark.implicits._

  // four docs: 1↔2 share a rare phrase and the common boilerplate;
  // 3 carries the boilerplate only; 4 is unrelated filler.
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over it all rights reserved"),
    (2L, "a quick brown fox runs far away all rights reserved"),
    (3L, "completely different words here all rights reserved"),
    (4L, "unrelated filler text with nothing shared anywhere")
  ).toDF("doc_id", "text")

  private def pairs = Seq((1L, 2L)).toDF("id_a", "id_b")

  test("ranks shared shingles by ascending corpus DF") {
    val out = Dedup.pairShingleEvidence(
        corpus, "doc_id", "text", pairs, n = 3, topK = 3)
      .orderBy("rank")
      .collect()
    // shared 3-shingles of (1,2): "quick brown fox" (df=2) and
    // "all rights reserved" (df=3) — rarest first, and only those two
    assert(out.length === 2)
    assert(out(0).getString(2) === "quick brown fox")
    assert(out(0).getLong(3) === 2L)
    assert(out(1).getString(2) === "all rights reserved")
    assert(out(1).getLong(3) === 3L)
    // cross-check the shared set independently of the operator:
    val sh = graft.text.TextAnalysis
      .explodeShingles(corpus, "doc_id", "text", 3)
    val s1 = sh.where($"doc_id" === 1L).select("shingle")
      .as[String].collect().toSet
    val s2 = sh.where($"doc_id" === 2L).select("shingle")
      .as[String].collect().toSet
    val shared = s1.intersect(s2)
    assert(out.map(_.getString(2)).toSet.subsetOf(shared))
    assert(out.length === math.min(3, shared.size))
  }

  test("topK caps per pair; rank dense from 1") {
    val out = Dedup.pairShingleEvidence(
        corpus, "doc_id", "text", pairs, n = 3, topK = 1)
      .collect()
    assert(out.length === 1)
    assert(out(0).getInt(4) === 1)
    assert(out(0).getString(2) === "quick brown fox")
  }

  test("pair with no shared shingles emits nothing") {
    val p = Seq((1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.pairShingleEvidence(
      corpus, "doc_id", "text", p, n = 3, topK = 3)
    assert(out.count() === 0L)
  }

  test("multiple pairs rank independently") {
    val p = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.pairShingleEvidence(
        corpus, "doc_id", "text", p, n = 3, topK = 3)
      .orderBy("id_a", "id_b", "rank").collect()
    val byPair = out.groupBy(r => (r.getLong(0), r.getLong(1)))
    assert(byPair.keySet === Set((1L, 2L), (2L, 3L)))
    // (2,3) shares only the boilerplate trigram
    assert(byPair((2L, 3L)).map(_.getString(2)).toSeq ===
      Seq("all rights reserved"))
    byPair.values.foreach { rows =>
      assert(rows.map(_.getInt(4)).toSeq === (1 to rows.length))
    }
  }
}
