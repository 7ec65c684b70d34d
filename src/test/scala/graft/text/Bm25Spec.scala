package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class Bm25Spec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String)]) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("text", StringType))),
    rows.map { case (i, t) => Row(i, t) })

  private def search(docs: Seq[(Long, String)], qs: Seq[(Long, String)],
      k: Int = 10, maxDf: Long = 1000000L) =
    TfIdf.bm25Search(corpus(docs), "id", "text",
        corpus(qs).toDF("qid", "text"), "qid", "text", k,
        maxDf = maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))

  test("rare terms dominate: the doc with the query's rare term " +
      "outranks docs sharing only common terms") {
    val docs = Seq(
      1L -> "common words everywhere",
      2L -> "common words zebra",       // rare term
      3L -> "common words words words")
    val out = search(docs, Seq(10L -> "zebra common"))
    assert(out.head._2 === 2L) // rank 1 carries the rare term
    assert(out.map(_._4).toSeq === (1 to out.length))
  }

  test("tf saturates: 10x term repetitions do not give 10x score") {
    val docs = Seq(
      1L -> "zebra filler filler filler",
      2L -> ("zebra " * 10 + "filler filler filler").trim)
    val out = search(docs, Seq(10L -> "zebra"))
      .map(t => t._2 -> t._3).toMap
    assert(out(2L) > out(1L))
    assert(out(2L).toDouble / out(1L) < 3.0, "saturation bound")
  }

  test("maxDf prunes corpus-wide terms from the join entirely") {
    val docs = (1L to 10L).map(i => i -> s"stopword unique$i")
    // 'stopword' has df 10 > 5: a query of only that term matches
    // nothing; adding a surviving term matches exactly its doc
    assert(search(docs, Seq(10L -> "stopword"), maxDf = 5).isEmpty)
    val out = search(docs, Seq(11L -> "stopword unique3"), maxDf = 5)
    assert(out.map(_._2).toSeq === Seq(3L))
  }

  test("deterministic across partitionings; k cuts with id tie-break") {
    val docs = (1L to 30L).map(i =>
      i -> (s"term${i % 5} term${i % 7} filler"))
    val qs = Seq(1L -> "term1 term3", 2L -> "term2")
    def run(parts: Int) =
      TfIdf.bm25Search(corpus(docs).repartition(parts), "id", "text",
          corpus(qs).toDF("qid", "text").repartition(parts), "qid",
          "text", k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
    assert(run(1) === run(8))
    run(1).groupBy(_._1).values.foreach { rows =>
      assert(rows.size <= 5)
    }
  }
}
