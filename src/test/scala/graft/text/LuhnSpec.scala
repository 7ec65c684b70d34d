package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.types._

/** [[TextAnalysis.luhnValid]] and [[TextAnalysis.ccCandidates]] —
  * known checksums, a naive-Scala Luhn replication over generated
  * numbers, and the maximal-digit-run candidate contract (no
  * lookaround regex — RE2-portable by construction).
  */
class LuhnSpec extends SparkSpec {

  private def run(texts: String*) = {
    val frame = df(
      StructType(Seq(StructField("text", StringType))),
      texts.map(Row(_)))
    frame.select(explode(TextAnalysis.ccCandidates(col("text")))
        .as("cand"))
      .select(col("cand"),
        TextAnalysis.luhnValid(col("cand")).as("ok"))
      .collect()
      .map(r => r.getAs[String]("cand") -> r.getAs[Boolean]("ok"))
  }

  private def naiveLuhn(s: String): Boolean = {
    val total = s.reverse.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 1) { val dd = 2 * d; if (dd > 9) dd - 9 else dd }
      else d
    }.sum
    total % 10 == 0
  }

  test("known card checksums: two valid, one invalid") {
    val out = run("pay 4532015112830366 or 4111111111111111 " +
      "not 1234567812345678").toMap
    assert(out("4532015112830366"))
    assert(out("4111111111111111"))
    assert(!out("1234567812345678"))
  }

  test("naive replication over a systematic family of 16-digit " +
      "numbers (exactly one check digit in 10 validates)") {
    val bases = (0 until 9).map(i => s"45320151128303$i")
    val nums = bases.flatMap(b => (0 to 9).map(d => b + d))
    val out = run(nums.mkString(" ")).toMap
    nums.foreach { n =>
      assert(out(n) == naiveLuhn(n), s"number $n") }
    bases.foreach { b =>
      assert((0 to 9).count(d => out(b + d.toString)) == 1) }
  }

  test("candidates are MAXIMAL digit runs of length 13-19: a 20-digit " +
      "run yields nothing, 12 digits yield nothing, separated runs " +
      "are found individually") {
    val out = run("12345678901234567890 and 123456789012 then " +
      "4532015112830366 x 4111111111111111")
    assert(out.map(_._1).toSeq ==
      Seq("4532015112830366", "4111111111111111"))
  }

  test("null text yields no candidates") {
    assert(run(null.asInstanceOf[String]).isEmpty)
  }
}
