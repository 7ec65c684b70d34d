package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR importance weights and budgeted selection
  * ([[TextAnalysis.dsirWeights]], [[TextAnalysis.dsirSelect]]).
  */
class DsirSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType, nullable = true),
    StructField("domain", StringType)))

  // target slice talks about markets; raw background talks about
  // weather; doc 5 straddles, doc 6 is token-less
  private def docs = df(schema, Seq(
    Row(1L, "markets rally as bonds and equities surge", "target"),
    Row(2L, "bonds yield curve inverts as markets wobble", "target"),
    Row(3L, "rain clouds gather over the cold wet valley", "bg"),
    Row(4L, "sunny skies and a warm dry breeze all week", "bg"),
    Row(5L, "markets shrug off rain as equities climb", "bg"),
    Row(6L, "", "bg")))

  private def weights = TextAnalysis.dsirWeights(
    docs, "doc_id", "text", col("domain") === "target")

  test("target-aligned documents outscore background documents") {
    val w = weights.collect()
      .map(r => r.getLong(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    // market-y docs strictly above weather docs; straddler between
    assert(w(1L).get > w(5L).get && w(2L).get > w(5L).get)
    assert(w(5L).get > w(3L).get && w(5L).get > w(4L).get)
  }

  test("scores are exact micro-unit longs matching a driver replay " +
      "of the published formula (hash buckets, add-1 smoothing)") {
    val buckets = 1024
    def bucket(w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % buckets
    }
    val all = docs.collect().map(r => (r.getLong(0),
      Option(r.getString(1)).getOrElse(""), r.getString(2)))
    val tok = all.flatMap { case (id, text, dom) =>
      "[a-z0-9]+".r.findAllIn(text.toLowerCase)
        .map(w => (id, dom == "target", bucket(w))).toSeq
    }
    val nr = tok.length.toDouble
    val nt = tok.count(_._2).toDouble
    val cr = tok.groupBy(_._3).map { case (b, xs) => b -> xs.length }
    val ct = tok.filter(_._2).groupBy(_._3)
      .map { case (b, xs) => b -> xs.length }
    def qlr(b: Long): Long = math.floor(math.log(
      ((ct.getOrElse(b, 0) + 1.0) * (nr + buckets)) /
        ((cr(b) + 1.0) * (nt + buckets))) * 1e6 + 0.5).toLong
    val expect = tok.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(x => qlr(x._3)).sum }
    val got = weights.collect()
      .flatMap(r => Option(r.get(2))
        .map(s => r.getLong(0) -> s.asInstanceOf[Long])).toMap
    assert(got == expect)
  }

  test("token-less documents carry n_tokens 0 and a NULL score") {
    val r6 = weights.where(col("doc_id") === 6L).collect().head
    assert(r6.getLong(1) == 0L)
    assert(r6.isNullAt(2))
  }

  test("budget cut keeps the ranked prefix within the token budget " +
      "and never selects token-less docs") {
    val w = weights.collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, s) => (-s, id) }
    val budget = w.head._2 + w(1)._2 // exactly the top two docs
    val sel = TextAnalysis.dsirSelect(docs, "doc_id", "text",
        col("domain") === "target", budget)
      .collect().map(_.getLong(0)).toSet
    assert(sel == w.take(2).map(_._1).toSet)
    // budget below the top doc's tokens selects nothing
    assert(TextAnalysis.dsirSelect(docs, "doc_id", "text",
      col("domain") === "target", w.head._2 - 1).count() == 0L)
  }

  test("an empty target slice still scores (uniform smoothing only — " +
      "every bucket ratio identical, ranking falls to doc length)") {
    val w = TextAnalysis.dsirWeights(
        docs, "doc_id", "text", lit(false))
      .where(col("score_micro").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2)))
    // with ct = 0 everywhere the per-bucket ratio depends only on cr:
    // scores stay finite and defined
    assert(w.length == 5)
  }
}
