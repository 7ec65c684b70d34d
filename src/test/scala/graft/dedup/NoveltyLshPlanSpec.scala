package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Dedup.noveltyScreen]] and [[Dedup.lshPlan]] — hand-computed
  * novelty fractions, shingle-less-document nulls, and the closed-form
  * S-curve against directly-computed math.
  */
class NoveltyLshPlanSpec extends SparkSpec {

  import spark.implicits._

  test("noveltyScreen: hand-computed seen/total per doc; unseen doc " +
      "scores 1.0; shingle-less doc reports nulls") {
    val ref = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox runs"), // shares 2 of 3 shingles
      (2L, "completely novel text here today"), // shares none
      (3L, "too short") // < 3 words → no shingles
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScreen(docs, "doc_id", "text", ref, "text", 3)
      .orderBy("doc_id").collect()
    // doc 1 shingles: {the quick brown, quick brown fox, brown fox runs}
    // ref has the first two
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 2L)
    assert(out(0).getDouble(3) === 0.333333) // 1 − 2/3 rounded to 6
    assert(out(1).getLong(2) === 0L && out(1).getDouble(3) === 1.0)
    assert(out(2).getLong(1) === 0L && out(2).isNullAt(3))
  }

  test("noveltyScreen counts DISTINCT shingles once per doc") {
    val ref = Seq((9L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val out = Dedup.noveltyScreen(docs, "doc_id", "text", ref, "text", 3)
      .collect()(0)
    // distinct 3-shingles of "a b c a b c a b c": abc, bca, cab → all
    // present in the ref
    assert(out.getLong(1) === 3L && out.getLong(2) === 3L)
    assert(out.getDouble(3) === 0.0)
  }

  test("lshPlan matches the closed form computed with plain folds, " +
      "flags FP below / FN above the threshold, and is grid-complete") {
    val out = Dedup.lshPlan(spark, Seq((4, 4), (16, 1)),
        threshold = 0.8, gridStepMilli = 50)
      .orderBy("bands", "rows_per_band", "s_milli").collect()
    assert(out.length === 2 * 19)
    def fold(x: Double, k: Int): Double =
      (1 to k).foldLeft(1.0)((a, _) => a * x)
    out.foreach { r =>
      val (b, rr, sm) = (r.getInt(0), r.getInt(1), r.getInt(2))
      val s = sm.toDouble / 1000.0
      val want = BigDecimal(1.0 - fold(1.0 - fold(s, rr), b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - want) < 1e-9, s"($b,$rr,$sm)")
      assert(r.getInt(4) === (if (s < 0.8 && r.getDouble(3) >= 0.5) 1 else 0))
      assert(r.getInt(5) === (if (s >= 0.8 && r.getDouble(3) < 0.5) 1 else 0))
    }
    // the known shape: banding with (16,1) is recall-leaning (high p
    // at low s), (4,4) is precision-leaning
    val p = out.map(r => ((r.getInt(0), r.getInt(2)), r.getDouble(3))).toMap
    assert(p((16, 300)) > p((4, 300)))
  }
}
