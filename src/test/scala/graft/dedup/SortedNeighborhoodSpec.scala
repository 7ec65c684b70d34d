package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.sortedNeighborhoodPairs]] — candidate completeness within
  * the window, the bucket-banding's equivalence to the plain rank-gap
  * definition, and the verify threshold.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  private def recs = Seq(
    (1L, "jon smith"), (2L, "john smith"), (3L, "john smyth"),
    (4L, "maria lopez"), (5L, "mariah lopez"), (6L, "zzz unrelated"),
    (7L, "aaron a"), (8L, "aaron b"))
    .toDF("id", "name")

  /** Reference: all pairs within `w` in global (key, id) sort order,
    * verified by edit distance.
    */
  private def ref(w: Int, maxDist: Int): Set[(Long, Long)] = {
    val sorted = recs.orderBy("name", "id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w + 1, sorted.length)
      if lev(sorted(i)._2, sorted(j)._2) <= maxDist
    } yield (sorted(i)._1, sorted(j)._1)).toSet
  }

  test("pairs equal the plain rank-gap definition for several " +
      "window sizes") {
    for (w <- Seq(1, 2, 5)) {
      val got = Dedup.sortedNeighborhoodPairs(recs, "id", "name",
          window = w, maxDist = 2)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === ref(w, 2), s"window=$w")
    }
  }

  test("sortedNeighborhoodScored: one stable schema for every scorer, " +
      "and each thresholded variant equals a plain filter over it") {
    val cols = Seq("id_a", "id_b", "key_a", "key_b", "score", "rank_gap")
    for (sc <- Dedup.snScorers) {
      val scored = Dedup.sortedNeighborhoodScored(
        recs, "id", "name", window = 3, scorer = sc)
      assert(scored.columns.toSeq === cols, sc)
      assert(scored.schema("score").dataType.typeName === "double", sc)
    }
    // the same candidate set is scored by every scorer (one generator)
    val counts = Dedup.snScorers.map(sc =>
      Dedup.sortedNeighborhoodScored(recs, "id", "name", 3, sc).count())
    assert(counts.distinct.size === 1)
    // wrappers == filter over scored (keys only; values spot-checked)
    val viaScored = Dedup.sortedNeighborhoodScored(
        recs, "id", "name", 3, "levenshtein")
      .where(col("score") <= 2).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaWrapper = Dedup.sortedNeighborhoodPairs(
        recs, "id", "name", 3, 2).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaScored === viaWrapper)
    val jwScored = Dedup.sortedNeighborhoodScored(
        recs, "id", "name", 3, "jaro_winkler")
      .where(col("score") >= 0.9).count()
    assert(jwScored ===
      Dedup.sortedNeighborhoodPairsJw(recs, "id", "name", 3, 0.9).count())
    intercept[IllegalArgumentException] {
      Dedup.sortedNeighborhoodScored(recs, "id", "name", 3, "cosine")
    }
  }

  test("rank_gap is within [1, window] and dist within [0, maxDist]; " +
      "null keys are dropped") {
    val withNull = recs.unionByName(
      Seq((99L, null.asInstanceOf[String])).toDF("id", "name"))
    val out = Dedup.sortedNeighborhoodPairs(withNull, "id", "name",
      window = 3, maxDist = 2).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(5) >= 1L && r.getLong(5) <= 3L)
      assert(r.getInt(4) >= 0 && r.getInt(4) <= 2)
      assert(r.getLong(0) != 99L && r.getLong(1) != 99L)
    }
  }
}
