package graft.operators

import graft.SparkSpec
import graft.expressions.MisraGriesSketch
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Misra–Gries sketch algebra and the exact two-phase
  * [[Analytics.heavyHitters]] operator.
  */
class HeavyHittersSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("v", StringType)))

  private def values(vals: String*) = df(schema, vals.map(Row(_)))

  private def exact(vals: Seq[String], phi: Double): Set[(String, Long)] = {
    val n = vals.count(_ != null)
    vals.filter(_ != null).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c.toDouble > phi * n.toDouble }
      .toSet
  }

  private def run(phi: Double, vals: String*): Set[(String, Long)] =
    Analytics.heavyHitters(values(vals: _*), "v", phi)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("matches the exact grouped count on a skewed stream") {
    val vals = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 15).map(i => s"cold$i")
    assert(run(0.2, vals: _*) == exact(vals, 0.2))
    assert(run(0.2, vals: _*) == Set(("hot", 60L), ("warm", 25L)))
  }

  test("eviction pressure: many distinct values, k far below cardinality") {
    // 500 singletons + one value at 10% — k = 20 counters must retain it
    val vals = (1 to 500).map(i => s"u$i") ++ Seq.fill(56)("dominant")
    assert(run(0.05, vals: _*) == exact(vals, 0.05))
    assert(run(0.05, vals: _*) == Set(("dominant", 56L)))
  }

  test("strict threshold: a value at exactly minFraction is excluded") {
    // 2 of 10 rows = exactly 0.2 — strictly-greater keeps it out
    val vals = Seq("a", "a", "b", "b", "b", "c", "c", "c", "d", "e")
    assert(run(0.2, vals: _*) == Set(("b", 3L), ("c", 3L)))
  }

  test("nulls carry no frequency and do not count toward N") {
    val vals = Seq("a", "a", "a", null, null, null, null, "b")
    // N = 4 non-null; a at 3/4 qualifies at 0.5, b at 1/4 does not
    assert(run(0.5, vals: _*) == Set(("a", 3L)))
  }

  test("empty input and no-qualifier input return empty, not error") {
    assert(run(0.5) == Set.empty)
    assert(run(0.9, "a", "b", "c") == Set.empty)
  }

  test("sketch retention bound survives partition merges") {
    // spread across partitions so merge() (not just reduce) runs; the
    // 12% value must be in the candidate set at k = 10
    val vals = (1 to 880).map(i => s"noise${i % 400}") ++ Seq.fill(120)("hh")
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Row(_)), 8), schema)
    val cands = d.agg(MisraGriesSketch.sketch(10)(col("v")))
      .head().getSeq[String](0)
    assert(cands.size <= 10)
    assert(cands.contains("hh"))
  }

  test("fraction column is cnt/N rounded to 6") {
    val out = Analytics.heavyHitters(
        values(Seq.fill(3)("x") ++ Seq("y"): _*), "v", 0.5)
      .collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 0.75)
  }

  test("skewReport: heavy keys carry exact counts, shares and the " +
      "task-imbalance ratio; null keys excluded") {
    // 60 of "hot", 10 each of 4 cold keys, 5 nulls → n=100 non-null,
    // 5 keys, mean 20 → hot ratio = 60/20 = 3
    val vals = Seq.fill(60)("hot") ++
      (1 to 4).flatMap(k => Seq.fill(10)(s"cold$k")) ++
      Seq.fill(5)(null: String)
    val out = Analytics.skewReport(values(vals: _*), "v",
        minFraction = 0.25, exactKeys = true)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("key") == "hot")
    assert(r.getAs[Long]("n_rows_key") == 60L)
    assert(r.getAs[Double]("fraction") == 0.6)
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Long]("n_keys") == 5L)
    assert(r.getAs[Double]("skew_ratio") == 3.0)
  }

  test("skewReport DEFAULT (HLL key cardinality, the bounded-state " +
      "path) lands within the sketch's stated error on a " +
      "known-cardinality corpus, and skew_ratio derives from it") {
    // 2000 distinct cold keys (1 row each) + 2000 hot rows; exact
    // n_keys = 2001. approx_count_distinct's default rsd is 0.05 —
    // accept 3×rsd (deterministic for fixed input, generous against
    // hash-collision variance)
    val vals = Seq.fill(2000)("hot") ++ (1 to 2000).map(i => s"cold$i")
    val out = Analytics.skewReport(values(vals: _*), "v",
        minFraction = 0.25)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("key") == "hot")
    assert(r.getAs[Long]("n_rows_key") == 2000L)
    val nKeys = r.getAs[Long]("n_keys")
    assert(math.abs(nKeys - 2001L) <= (2001 * 0.15).toLong,
      s"HLL cardinality $nKeys outside 15% of 2001")
    // skew_ratio = cnt · n_keys / n_rows, with the HLL n_keys
    assert(r.getAs[Double]("skew_ratio") ==
      math.round(2000.0 * nKeys / 4000.0 * 10000) / 10000.0)
  }
}
