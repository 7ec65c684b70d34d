package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Data-constrained epoch water-filling
  * ([[Sampling.epochAllocation]]).
  */
class EpochAllocationSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("src", StringType),
    StructField("u", LongType),
    StructField("w", LongType)))

  private def sources(rows: (String, Long, Long)*) =
    df(schema, rows.map { case (s, u, w) => Row(s, u, w) })

  private def run(
      d: org.apache.spark.sql.DataFrame, budget: Long,
      capMilli: Long = 4000L, rounds: Int = 3) =
    Sampling.epochAllocation(d, "src", "u", "w", budget, capMilli,
        rounds)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap

  test("uncapped sources split the budget weight-proportionally " +
      "with exact floor-division") {
    val out = run(sources(("a", 1000L, 3L), ("b", 1000L, 1L)),
      budget = 2000L)
    // round 1: a gets 2000*3//4 = 1500, b gets 2000*1//4 = 500
    assert(out("a") == ((1500L, 1500L, false)))
    assert(out("b") == ((500L, 500L, false)))
  }

  test("a capped source frees budget that redistributes to the " +
      "uncapped on later rounds") {
    // a caps at 1 epoch = 1000 tokens; its weight dominates round 1
    val out = run(sources(("a", 1000L, 9L), ("b", 10000L, 1L)),
      budget = 8000L, capMilli = 1000L)
    assert(out("a") == ((1000L, 1000L, true)))
    // round 1 gives b 8000//10 = 800; rounds 2-3 hand it the rest of
    // what a could not absorb
    val (allocB, _, cappedB) = out("b")
    assert(!cappedB && allocB > 800L && allocB <= 7000L)
    // replay: r1 b=800, a=1000(cap); r2 rem=6200 all to b -> 7000
    assert(allocB == 7000L)
  }

  test("total allocation never exceeds the budget or the sum of caps") {
    val d = sources(("a", 500L, 7L), ("b", 2000L, 2L), ("c", 50L, 11L))
    for (budget <- Seq(100L, 3000L, 100000L)) {
      val out = run(d, budget, capMilli = 2000L)
      val total = out.values.map(_._1).sum
      assert(total <= budget)
      assert(total <= (500L * 2 + 2000L * 2 + 50L * 2))
    }
  }

  test("a budget above every cap saturates all sources at exactly " +
      "maxEpochsMilli") {
    val out = run(sources(("a", 100L, 1L), ("b", 300L, 5L)),
      budget = 100000L, capMilli = 2500L)
    assert(out("a") == ((250L, 2500L, true)))
    assert(out("b") == ((750L, 2500L, true)))
  }

  test("non-positive token or weight rows are excluded, not divided " +
      "by zero") {
    val out = run(sources(("a", 1000L, 1L), ("z", 0L, 5L),
      ("y", 100L, 0L)), budget = 1000L)
    assert(out.keySet == Set("a"))
  }

  test("results are partitioning-invariant (exact integer arithmetic)") {
    val d = sources((1 to 50).map(i =>
      (s"s$i", 100L + i * 7L, 1L + i % 9)): _*)
    val one = run(d.repartition(1), 20000L, 1500L)
    val many = run(d.repartition(13), 20000L, 1500L)
    assert(one == many)
  }
}
