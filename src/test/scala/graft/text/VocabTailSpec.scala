package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Closed-form checks for the vocabulary-sizing pair: coverage/OOV
  * curve and the Hill tail-index estimator.
  */
class VocabTailSpec extends SparkSpec {

  private def corpus(texts: Seq[String]) = df(
    StructType(Seq(StructField("text", StringType))),
    texts.map(Row(_)))

  test("vocabCoverage: exact mass shares on a known distribution") {
    val out = TextAnalysis.vocabCoverage(
        corpus(Seq("a a a b b c")), "text", checkpoints = Seq(1, 2, 3))
      .orderBy("vocab_size").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L)) // n_types
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 5L, 6L)) // covered
    out.foreach { r =>
      assert(r.getLong(3) === 6L && r.getLong(4) === 3L)
      assert(r.getDouble(6) === 1.0 - r.getDouble(5)) // oov = 1 − cov
    }
    assert(out(0).getDouble(5) === 0.5)
    assert(out(2).getDouble(5) === 1.0)
  }

  test("vocabCoverage: equal counts rank by token text, checkpoints " +
      "past the vocab saturate") {
    val out = TextAnalysis.vocabCoverage(
        corpus(Seq("b b a a c")), "text", checkpoints = Seq(1, 5))
      .orderBy("vocab_size").collect()
    // tie a/b at 2 → rank 1 is "a"
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getDouble(5) === 0.4)
    // checkpoint 5 > 3 types: everything covered
    assert(out(1).getLong(1) === 3L)
    assert(out(1).getDouble(5) === 1.0 && out(1).getDouble(6) === 0.0)
  }

  test("hillTailIndex: closed-form alpha on constructed counts") {
    // token ti appears (32 − i) times, i = 1..12: top-10 counts are
    // 31..22 and x_{11} = 21
    val words = (1 to 12).flatMap(i =>
      Seq.fill(32 - i)(f"t$i%02d")).mkString(" ")
    val out = TextAnalysis.hillTailIndex(corpus(Seq(words)), "text",
      k = 10).collect().head
    assert(out.getLong(0) === 10L)
    assert(out.getLong(1) === 21L)
    val lnsum = (1 to 10).map(i => math.log((32.0 - i) / 21.0)).sum
    assert(math.abs(out.getDouble(2) - 10.0 / lnsum) < 1e-5)
    assert(math.abs(out.getDouble(3) - lnsum / 10.0) < 1e-5)
  }

  test("hashCollisionAudit: pigeonhole at dim 2, conservation across " +
      "dims") {
    val out = TextAnalysis.hashCollisionAudit(
        corpus(Seq("aa bb cc dd ee aa aa")), "text",
        dims = Seq(2, 1024))
      .orderBy("dim").collect()
    // 5 distinct tokens into 2 buckets: some bucket holds ≥ 3
    assert(out(0).getLong(3) >= 3L)
    assert(out(0).getDouble(4) > 0.0)
    // type count is conserved whatever the dim
    assert(out.map(_.getLong(1)).toSet === Set(5L))
    out.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getInt(0).toLong, 5L))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("vocabCoverage/hillTailIndex: contract guards fire") {
    val c = corpus(Seq("a b"))
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(c, "text", checkpoints = Seq(5000))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.hillTailIndex(c, "text", k = 5)
    }
  }
}
