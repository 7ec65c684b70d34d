package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Sampling.neymanAllocation]] — closed-form optimal shares, the
  * exact-budget Hamilton rounding, degenerate-strata handling, and
  * the planted q297 spread on the real corpus.
  */
class NeymanAllocationSpec extends SparkSpec {

  private def rowsDf(rows: (String, Long)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("x", LongType))),
    rows.map { case (g, x) => Row(g, x) })

  test("closed form: equal sizes, stds 1 vs 3 -> Neyman splits the " +
      "budget 1:3 while proportional splits it 1:1") {
    // a: {0,2} repeated (std 1.03..), b: {0,6} repeated (std 3.09..)
    val rows = (1 to 20).flatMap(i =>
      Seq(("a", (i % 2) * 2L), ("b", (i % 2) * 6L)))
    val out = Sampling.neymanAllocation(rowsDf(rows: _*), "g",
      col("x"), budget = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(3) == 25L && out("b").getLong(3) == 75L)
    assert(out("a").getLong(4) == 50L && out("b").getLong(4) == 50L)
  }

  test("allocations sum EXACTLY to the budget even when quotas " +
      "don't divide (largest-remainder, deterministic tie-break)") {
    val rows = Seq.fill(3)(("a", 1L)) ++ Seq.fill(3)(("a", 5L)) ++
      Seq.fill(5)(("b", 1L)) ++ Seq.fill(5)(("b", 5L)) ++
      Seq.fill(7)(("c", 1L)) ++ Seq.fill(7)(("c", 5L))
    val out = Sampling.neymanAllocation(rowsDf(rows: _*), "g",
      col("x"), budget = 10L).collect()
    assert(out.map(_.getLong(3)).sum == 10L)
    assert(out.map(_.getLong(4)).sum == 10L)
  }

  test("a zero-variance stratum gets weight 0 under Neyman but its " +
      "proportional share under the fallback comparison") {
    val rows = Seq.fill(10)(("flat", 7L)) ++
      (1 to 10).map(i => ("varied", i.toLong * 10L))
    val out = Sampling.neymanAllocation(rowsDf(rows: _*), "g",
      col("x"), budget = 20L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getLong(3) == 0L)
    assert(out("varied").getLong(3) == 20L)
    assert(out("flat").getLong(4) == 10L)
  }

  test("an ALL-degenerate corpus falls back to proportional " +
      "allocation instead of dividing by zero") {
    val rows = Seq.fill(6)(("a", 5L)) ++ Seq.fill(3)(("b", 9L))
    val out = Sampling.neymanAllocation(rowsDf(rows: _*), "g",
      col("x"), budget = 9L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(3) == 6L && out("b").getLong(3) == 3L)
  }

  test("q297 on the real corpus: the tripled FURNITURE spread pulls " +
      "its optimal allocation far past proportional; both columns " +
      "sum to the budget") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.SamplingRegistry
        .neymanAllocationQ(spark, "/root/testdata/sf0.001").collect()
      assert(rows.map(_.getLong(3)).sum == 1000L)
      assert(rows.map(_.getLong(4)).sum == 1000L)
      val f = rows.find(_.getString(0) == "FURNITURE").get
      assert(f.getLong(3) > f.getLong(4) * 3 / 2,
        s"neyman ${f.getLong(3)} vs prop ${f.getLong(4)}")
    }
  }
}
