package graft.text

import graft.SparkSpec

/** q290 selection curve — decile partition invariants, exact-dup
  * labeling, and the monotone quality/short-rate tradeoff on the
  * real corpus.
  */
class SelectionCurveSpec extends SparkSpec {

  test("q290 on the real corpus: ten deciles partition the corpus, " +
      "scores descend, and the short-doc share rises as quality falls") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.TextRegistry
        .selectionCurveQ(spark, "/root/testdata/sf0.001")
        .orderBy("decile").collect()
      assert(rows.length == 10)
      assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
      val total = rows.map(_.getLong(1)).sum
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .where("text IS NOT NULL").count()
      assert(total == docs, s"deciles must partition: $total vs $docs")
      // mean score strictly descends decile to decile
      val means = rows.map(_.getDouble(6))
      assert(means.zip(means.tail).forall { case (a, b) => a > b })
      // the quality floor tradeoff is visible: the bottom decile
      // carries more short docs than the top
      assert(rows.last.getDouble(4) > rows.head.getDouble(4))
      // score bands are coherent: min <= max within, and bands
      // descend across deciles (max of k+1 <= min of k up to ties)
      rows.foreach(r => assert(r.getDouble(7) <= r.getDouble(8)))
      rows.zip(rows.tail).foreach { case (hi, lo) =>
        assert(lo.getDouble(8) <= hi.getDouble(7) + 1e-9)
      }
    }
  }
}
