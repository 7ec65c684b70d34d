package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TfIdf.dirichletQlSearch]] — hand-computed log-likelihood
  * ranking on a three-doc corpus, the df-cap/norm-count contract,
  * and self-retrieval on the real corpus (q294).
  */
class DirichletQlSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = df(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))),
    rows.map { case (id, t) => Row(id, t) })

  private val threeDocs = corpus(
    (1L, "a a b"), (2L, "b c"), (3L, "c c c"))

  test("hand-computed ranking: query 'a c' over {aa b | b c | ccc} " +
      "with mu=2 orders d1 > d3 > d2 by exact nano-floored lls") {
    val out = TfIdf.dirichletQlSearch(threeDocs, "doc_id", "text",
      corpus((100L, "a c")), "doc_id", "text", k = 10, mu = 2.0)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    // d1: ln(1 + 2*8/(2*2)) + 2*ln(2/(3+2)), nano-floored
    val d1 = math.floor(math.log(1.0 + 2.0 * 8.0 / (2.0 * 2.0)) *
      1000000000L).toLong +
      math.floor(math.log(2.0 / (3.0 + 2.0)) * 2.0 * 1000000000L).toLong
    assert(out.head.getLong(2) == d1)
  }

  test("a query term absent from the corpus contributes neither a " +
      "match nor a norm count (|q| counts surviving terms)") {
    val withGhost = TfIdf.dirichletQlSearch(threeDocs, "doc_id",
      "text", corpus((100L, "a c zzz")), "doc_id", "text",
      k = 10, mu = 2.0).orderBy("rank").collect()
    val without = TfIdf.dirichletQlSearch(threeDocs, "doc_id",
      "text", corpus((100L, "a c")), "doc_id", "text",
      k = 10, mu = 2.0).orderBy("rank").collect()
    assert(withGhost.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      without.map(r => (r.getLong(1), r.getLong(2))).toSeq)
  }

  test("the df cap drops a term from both the match sum and the " +
      "norm count") {
    // 'b' appears in 2 docs; cap at 1 removes it everywhere
    val out = TfIdf.dirichletQlSearch(threeDocs, "doc_id", "text",
      corpus((100L, "b a")), "doc_id", "text", k = 10, mu = 2.0,
      maxDf = 1L).orderBy("rank").collect()
    // only 'a' survives -> only d1 is a candidate, norm uses qlen=1
    assert(out.map(_.getLong(1)).toSeq == Seq(1L))
    val want = math.floor(math.log(1.0 + 2.0 * 8.0 / (2.0 * 2.0)) *
      1000000000L).toLong +
      math.floor(math.log(2.0 / (3.0 + 2.0)) * 1.0 * 1000000000L).toLong
    assert(out.head.getLong(2) == want)
  }

  test("q294 on the real corpus: every query retrieves itself in " +
      "its own top 10 (a shorter near-dup can out-norm the exact " +
      "self on the template corpus) and ranks are dense") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.TextRegistry
        .dirichletQlQ(spark, "/root/testdata/sf0.001").collect()
      val byQ = rows.groupBy(_.getLong(0))
      assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
      byQ.foreach { case (q, rs) =>
        val sorted = rs.sortBy(_.getInt(3))
        assert(sorted.exists(_.getLong(1) == q),
          s"query $q missing from its own top 10")
        assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length))
      }
    }
  }
}
