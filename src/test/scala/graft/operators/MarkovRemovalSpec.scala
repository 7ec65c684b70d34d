package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[Analytics.markovRemovalEffect]] — hand-computed removal effects
  * on a small funnel (exact micro fixed-point), the zero-effect
  * dead-end channel, and the within-K truncation semantics.
  */
class MarkovRemovalSpec extends SparkSpec {

  private def trans(rows: (String, String, Long)*) = df(
    StructType(Seq(
      StructField("f", StringType),
      StructField("t", StringType),
      StructField("n", LongType))),
    rows.map { case (f, t, n) => Row(f, t, n) })

  private def run(iters: Int, rows: (String, String, Long)*) =
    Analytics.markovRemovalEffect(trans(rows: _*), "f", "t", "n",
        "START", "CONV", "DROP", iters)
      .orderBy("channel")

  // START splits A/B evenly; A converts half; B feeds A half:
  // v(A)=.5, v(B)=.25, v(START)=.375 — all exact in micro units
  private val funnel = Seq(
    ("START", "A", 2L), ("START", "B", 2L),
    ("A", "CONV", 1L), ("A", "DROP", 1L),
    ("B", "A", 1L), ("B", "DROP", 1L))

  test("hand-computed: removing A kills every conversion (effect " +
      "375000/375000 = 1), removing B only its feeder path " +
      "(125000/375000); attribution 0.75/0.25") {
    val out = run(12, funnel: _*).collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[String]("channel") == "A")
    assert(a.getAs[Long]("conv_micro_full") == 375000L)
    assert(a.getAs[Long]("conv_micro_removed") == 0L)
    assert(a.getAs[Long]("effect_micro") == 375000L)
    assert(a.getAs[Double]("removal_effect") == 1.0)
    assert(a.getAs[Double]("attribution") == 0.75)
    assert(b.getAs[String]("channel") == "B")
    assert(b.getAs[Long]("conv_micro_removed") == 250000L)
    assert(b.getAs[Long]("effect_micro") == 125000L)
    assert(b.getAs[Double]("removal_effect") == 0.333333)
    assert(b.getAs[Double]("attribution") == 0.25)
  }

  test("a dead-end channel (never on a converting path) prices at " +
      "exactly zero") {
    val out = run(12,
      ("START", "A", 1L), ("START", "C", 1L),
      ("A", "CONV", 1L), ("C", "DROP", 1L)).collect()
    val a = out(0); val c = out(1)
    assert(a.getAs[Long]("conv_micro_full") == 500000L)
    assert(a.getAs[Double]("attribution") == 1.0)
    assert(c.getAs[String]("channel") == "C")
    assert(c.getAs[Long]("effect_micro") == 0L)
    assert(c.getAs[Double]("removal_effect") == 0.0)
    assert(c.getAs[Double]("attribution") == 0.0)
  }

  test("within-K truncation is the contract: at K=2 B's 3-hop " +
      "feeder path hasn't reached START yet, so B prices at zero " +
      "while A already prices in full") {
    val out = run(2, funnel: _*).collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("conv_micro_full") == 250000L)
    assert(a.getAs[Long]("effect_micro") == 250000L)
    assert(b.getAs[Long]("effect_micro") == 0L)
  }

  test("no conversions at all: full probability 0, ratios null " +
      "(never a division blow-up)") {
    val out = run(6,
      ("START", "A", 1L), ("A", "DROP", 1L)).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("conv_micro_full") == 0L)
    assert(out(0).isNullAt(out(0).fieldIndex("removal_effect")))
    assert(out(0).isNullAt(out(0).fieldIndex("attribution")))
  }
}
