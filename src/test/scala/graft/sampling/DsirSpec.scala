package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Sampling.dsirWeights]] — a full naive-Scala replication (md5
  * buckets, add-1 λ, nano-floored lns), target-vocabulary ordering,
  * the null-flag contract, and floor division on negative weights.
  */
class DsirSpec extends SparkSpec {

  private def frame(rows: (Long, String, String)*) = df(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType))),
    rows.map { case (id, t, l) => Row(id, t, l) })

  private def run(buckets: Int, topK: Int,
      rows: (Long, String, String)*) =
    Sampling.dsirWeights(frame(rows: _*), "doc_id", "text",
      targetFlag = col("lang") === "en", buckets = buckets, topK = topK)

  /** Independent replication: java MessageDigest md5, first 8 hex
    * chars as a long, % buckets; add-1 smoothing; nano-floored lns;
    * Math.floorDiv for the per-token average.
    */
  private def naive(rows: Seq[(Long, String, String)], buckets: Int)
      : Seq[(Long, Int, Long, Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Long = {
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    def words(t: String): Seq[String] =
      "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
    val toks = rows.filter(_._2 != null).flatMap { case (id, t, l) =>
      words(t).map(w => (id, l == "en", bucket(w)))
    }
    val tb = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size).toMap
    val rb = toks.filterNot(_._2).groupBy(_._3).view.mapValues(_.size)
      .toMap
    val (tt, rt) = (tb.values.sum, rb.values.sum)
    def nanoLn(x: Long) = math.floor(math.log(x.toDouble) * 1e9).toLong
    def lam(b: Long) =
      nanoLn(tb.getOrElse(b, 0) + 1L) - nanoLn(tt + buckets.toLong) -
        (nanoLn(rb.getOrElse(b, 0) + 1L) - nanoLn(rt + buckets.toLong))
    toks.groupBy(t => (t._1, t._2)).toSeq.map { case ((id, tgt), ts) =>
      val w = ts.map(t => lam(t._3)).sum
      (id, if (tgt) 1 else 0, ts.size.toLong, w,
        Math.floorDiv(w, ts.size.toLong))
    }.sortBy(t => (-t._5, t._1))
  }

  private val corpus = Seq(
    (1L, "zebra zebra quokka zebra", "en"),
    (2L, "zebra quokka quokka", "en"),
    (3L, "yak yak walrus yak", "de"),
    (4L, "walrus yak walrus", "fr"),
    (5L, "zebra yak quokka walrus", "de"))

  test("full naive replication: buckets, lambda, weights, floor " +
      "averages, ordering") {
    val out = run(64, 10, corpus: _*).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("is_target"),
        r.getAs[Long]("tokens"), r.getAs[Long]("w_nano"),
        r.getAs[Long]("avg_lr_nano")))
    assert(out.toSeq == naive(corpus, 64))
  }

  test("target-vocabulary documents outrank raw-vocabulary ones, " +
      "and signs split accordingly") {
    val out = run(64, 10, corpus: _*).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("avg_lr_nano")).toMap
    // en-exclusive words score positive, de/fr-exclusive negative
    assert(byId(1L) > 0L && byId(2L) > 0L)
    assert(byId(3L) < 0L && byId(4L) < 0L)
    // the mixed doc sits between the pure ones
    assert(byId(5L) < byId(2L) && byId(5L) > byId(3L))
    // and the ranking is descending by avg with doc_id tie-break
    val avgs = out.map(_.getAs[Long]("avg_lr_nano")).toSeq
    assert(avgs == avgs.sorted(Ordering[Long].reverse))
  }

  test("null lang counts as raw corpus (is_target 0), never dropped") {
    val rows = corpus :+ (6L, "zebra walrus", null: String)
    val r = run(64, 10, rows: _*).collect()
      .find(_.getAs[Long]("doc_id") == 6L).get
    assert(r.getAs[Int]("is_target") == 0)
  }

  test("negative weights floor-divide (DuckDB // semantics), not " +
      "truncate") {
    val out = run(64, 10, corpus: _*).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("avg_lr_nano") ==
        Math.floorDiv(r.getAs[Long]("w_nano"),
          r.getAs[Long]("tokens")))
    }
    // the fixture genuinely exercises a negative, non-divisible case
    assert(out.exists(r => r.getAs[Long]("w_nano") < 0 &&
      r.getAs[Long]("w_nano") % r.getAs[Long]("tokens") != 0))
  }

  test("topK truncates after the deterministic sort") {
    val out = run(64, 2, corpus: _*).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ==
      naive(corpus, 64).take(2).map(_._1))
  }
}
