package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Analytics.diffInDiff]], [[Analytics.pageTrendTest]],
  * [[Analytics.ucb1Allocation]] — hand-computed references and the
  * contracts their scaladocs promise.
  */
class DidPageUcbSpec extends SparkSpec {

  import spark.implicits._

  test("diffInDiff: hand-computed cells — shared trend cancels, " +
      "the planted lift survives") {
    // ctl: pre mean 100, post mean 120 (trend +20)
    // treat: pre mean 200, post mean 250 (trend +20, effect +30)
    val rows =
      Seq.fill(4)(("g", false, false, 100L)) ++
      Seq.fill(5)(("g", false, true, 120L)) ++
      Seq.fill(3)(("g", true, false, 200L)) ++
      Seq.fill(6)(("g", true, true, 250L))
    val df = rows.toDF("g", "t", "p", "y")
    val r = Analytics.diffInDiff(df, Seq("g"), col("t"), col("p"),
      col("y")).collect()(0)
    assert(r.getAs[Double]("mean_ctl_pre") == 100.0)
    assert(r.getAs[Double]("mean_treat_post") == 250.0)
    assert(r.getAs[Double]("did") == 30.0)
    assert(r.getAs[Long]("n_treat_post") == 6L)
  }

  test("diffInDiff: a group missing a cell reports null did") {
    val df = Seq(("g", false, false, 1L), ("g", true, true, 2L))
      .toDF("g", "t", "p", "y")
    val r = Analytics.diffInDiff(df, Seq("g"), col("t"), col("p"),
      col("y")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("did")))
  }

  test("pageTrendTest: a perfect monotone dose response maxes L " +
      "and flags; a flat one doesn't") {
    // 6 blocks, 4 doses, value strictly increasing with dose:
    // every block ranks 1,2,3,4 -> R2_j = 2·b·j, L2 = 2bΣj² = 2b·30
    val mono = for (b <- 1 to 6; d <- 1 to 4)
      yield ("g", b.toLong, d.toLong, (d * 10).toLong)
    val r = Analytics.pageTrendTest(mono.toDF("g", "b", "d", "y"),
      Seq("g"), col("b"), col("d"), col("y")).collect()(0)
    assert(r.getAs[Long]("l2") == 2L * 6 * 30)
    assert(r.getAs[Int]("increasing") == 1)
    // flat: all equal -> every rank tie-averages to (k+1)/2,
    // L2 = b·Σj·(k+1) = 6·10·5 = 300 = E2 -> z = 0
    val flat = for (b <- 1 to 6; d <- 1 to 4)
      yield ("g", b.toLong, d.toLong, 7L)
    val rf = Analytics.pageTrendTest(flat.toDF("g", "b", "d", "y"),
      Seq("g"), col("b"), col("d"), col("y")).collect()(0)
    assert(rf.getAs[Double]("z") == 0.0)
    assert(rf.getAs[Int]("increasing") == 0)
  }

  test("pageTrendTest: incomplete blocks are excluded, the " +
      "Friedman completeness rule") {
    val mono = for (b <- 1 to 4; d <- 1 to 3)
      yield ("g", b.toLong, d.toLong, (d * 10).toLong)
    val extra = Seq(("g", 9L, 1L, 5L)) // block 9 has only dose 1
    val r = Analytics.pageTrendTest(
      (mono ++ extra).toDF("g", "b", "d", "y"),
      Seq("g"), col("b"), col("d"), col("y")).collect()(0)
    assert(r.getAs[Long]("n_blocks") == 4L)
  }

  test("ucb1Allocation: the bonus sends the next pull to the " +
      "under-explored arm despite a lower mean") {
    // arm a: 99 pulls mean 100; arm b: 1 pull mean 95 — the bonus
    // √(2 ln 100 / 1)·scale dwarfs the 5-cent mean gap at scale 50
    val df = (Seq.fill(99)(("g", "a", 100L)) ++ Seq(("g", "b", 95L)))
      .toDF("g", "arm", "y")
    val rows = Analytics.ucb1Allocation(df, Seq("g"), col("arm"),
      col("y"), scaleCents = 50.0).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(rows("b").getAs[Int]("chosen") == 1)
    assert(rows("a").getAs[Int]("chosen") == 0)
    // hand value: score_b = 95 + 50·√(2·ln100/1)
    val want = 95.0 + 50.0 * math.sqrt(2 * math.log(100.0))
    assert(math.abs(rows("b").getAs[Double]("ucb_score") - want)
      < 0.01)
  }

  test("ucb1Allocation: with equal exploration the best mean wins, " +
      "ties break on arm name") {
    val df = (Seq.fill(10)(("g", "a", 100L)) ++
      Seq.fill(10)(("g", "b", 100L)) ++
      Seq.fill(10)(("g", "c", 90L))).toDF("g", "arm", "y")
    val rows = Analytics.ucb1Allocation(df, Seq("g"), col("arm"),
      col("y"), scaleCents = 10.0).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(rows("a").getAs[Int]("chosen") == 1) // a before b on ties
    assert(rows("c").getAs[Int]("chosen") == 0)
  }
}
