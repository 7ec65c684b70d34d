package graft.operators

import graft.SparkSpec

/** q313 TextRank keywords — structural sanity on the real corpus:
  * stopwords can never appear, hub tokens outrank leaf tokens, and
  * the per-language top-10 contract holds. (The exact-integer
  * PageRank core is pinned by its own spec and the q154 oracle; this
  * spec pins the token-graph construction on top of it.)
  */
class TextrankSpec extends SparkSpec {

  test("q313 on the real corpus: 10 keywords per language, no " +
      "stopword survives the edge filter, ranks are positive and " +
      "ordered") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .textrankKeywordsQ(spark, "/root/testdata/sf0.001").collect()
      val byLang = rows.groupBy(_.getString(0))
      assert(byLang.keySet == Set("de", "en", "es", "fr", "zh"))
      byLang.values.foreach { rs =>
        assert(rs.length == 10)
        val ranks = rs.sortBy(_.getLong(3)).map(_.getLong(2))
        assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b },
          "pos order must be rank-descending")
        assert(ranks.forall(_ > 0L))
      }
      val stops = graft.text.TextAnalysis.stopwords.toSet
      assert(rows.forall(r => !stops.contains(r.getString(1))),
        "a stopword leaked into the keyword list")
    }
  }

  test("hub centrality: a token adjacent to many distinct tokens " +
      "outranks one that only repeats next to a single partner") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions._
    // hub: h co-occurs with x1..x4; leaf: l repeats with x1 only
    val text1 = "x1 h x2 h x3 h x4"
    val text2 = "l x1 l x1 l x1"
    val docsDf = df(
      StructType(Seq(
        StructField("lang", StringType),
        StructField("doc_id", LongType),
        StructField("text", StringType))),
      Seq(Row("en", 1L, text1), Row("en", 2L, text2)))
    val toks = docsDf.select(col("lang"), col("doc_id"),
      posexplode(graft.text.TextAnalysis.words(col("text")))
        .as(Seq("pos", "w")))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("doc_id")).orderBy(col("pos"))
    val bi = toks.withColumn("nx", lead(col("w"), 1).over(wnd))
      .where(col("nx").isNotNull && col("w") =!= col("nx"))
      .select(col("w").as("a"), col("nx").as("b"))
    val edges = bi.union(bi.select(col("b").as("a"), col("a").as("b")))
    val ranks = Analytics.pageRank(edges, "a", "b", iters = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("h") > ranks("l"),
      s"hub ${ranks("h")} should outrank leaf ${ranks("l")}")
  }
}
