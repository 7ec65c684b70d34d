package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[TfIdf.rocchioPrfSearch]] — the feedback loop on a constructed
  * corpus where expansion provably changes the ranking: a query
  * matching doc A whose feedback neighborhood shares a term with
  * doc B (which the original query NEVER matches) must surface B in
  * pass 2; weight semantics (2:1 half-units), original-term
  * exclusion, and q324 structure on the real corpus.
  */
class RocchioSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = df(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))),
    rows.map { case (i, t) => Row(i, t) })

  test("expansion surfaces a doc the original query cannot match") {
    // query: "alpha". docs 1-3 contain alpha AND bridge; doc 9
    // contains ONLY bridge (plus filler). Pass 1 finds 1-3; their
    // vote selects "bridge"; pass 2 must rank doc 9 above the
    // never-matching doc 10.
    val d = corpus(
      (1L, "alpha bridge filler1"), (2L, "alpha bridge filler2"),
      (3L, "alpha bridge filler3"), (9L, "bridge filler4 filler5"),
      (10L, "unrelated noise words"))
    val q = corpus((100L, "alpha"))
      .select(col("doc_id").as("query_id"), col("text"))
    // fbTerms = 4: the three rare fillers out-vote "bridge" on
    // idf mass (df 1 vs 4), so the term budget must reach it — the
    // selection is mass-ranked, not relevance-magic
    val out = TfIdf.rocchioPrfSearch(d, "doc_id", "text", q,
      "query_id", "text", k = 10, fbDocs = 3, fbTerms = 4)
      .collect()
    val ids = out.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(ids.contains(9L), s"expansion must reach doc 9: $ids")
    assert(!ids.contains(10L) ||
      ids.indexOf(9L) < ids.indexOf(10L))
    // original-query docs keep the lead (weight 2 on original terms)
    assert(Set(1L, 2L, 3L).contains(ids.head))
  }

  test("expansion terms exclude the original query's own terms") {
    val d = corpus(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha gamma"))
    val q = corpus((100L, "alpha"))
      .select(col("doc_id").as("query_id"), col("text"))
    val out = TfIdf.rocchioPrfSearch(d, "doc_id", "text", q,
      "query_id", "text", k = 10, fbDocs = 3, fbTerms = 10)
      .collect()
    // n_exp_terms counts beta and gamma but never alpha
    assert(out.head.getLong(4) == 2L)
  }

  test("q324 on the real corpus: 10 results per query, ranks dense, " +
      "expansion-term counts consistent and within budget") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.TextRegistry
        .rocchioPrfQ(spark, "/root/testdata/sf0.001").collect()
      val byQ = rows.groupBy(_.getLong(0))
      assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
      byQ.values.foreach { rs =>
        assert(rs.length == 10)
        assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 10))
        // the df cap (400 of ~500 docs) disqualifies most of the
        // 31-type vocabulary, and the query IS a whole document, so
        // fewer than 5 eligible expansion terms can remain — the
        // count must be consistent per query and within budget
        assert(rs.map(_.getLong(4)).distinct.length == 1)
        assert(rs.head.getLong(4) >= 0L && rs.head.getLong(4) <= 5L)
      }
    }
  }
}
