package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class KsTestSpec extends SparkSpec {

  private def frame(rows: Seq[(String, Double)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("v", DoubleType))),
    rows.map { case (g, v) => Row(g, v) })

  private def ks(base: Seq[(String, Double)], cur: Seq[(String, Double)]) =
    Drift.ksTest(frame(base), frame(cur), "v", Seq("g"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(6))))
      .toMap

  test("closed form: disjoint supports give D = 1") {
    val out = ks(
      Seq(("a", 1.0), ("a", 2.0)),
      Seq(("a", 10.0), ("a", 11.0), ("a", 12.0)))
    // after value 2: i=2, j=0 -> |2*3 - 0*2| = 6 = n1*n2 -> D = 1
    // (threshold 1.358·√(5/6) ≈ 1.24 > 1: tiny samples never flag —
    // the asymptotic bound is honest about its power)
    assert(out("a") === ((2L, 3L, 6L, 1.0, false)))
  }

  test("identical samples give D = 0") {
    val s = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0))
    val out = ks(s, s)
    assert(out("a")._3 === 0L)
    assert(!out("a")._5)
  }

  test("hand-computed supremum with cross-sample ties") {
    // base: 1,2,2,5  cur: 2,3  (n1=4, n2=2)
    // v=1: i=1,j=0 -> |2-0|=2 ; v=2: i=3,j=1 -> |6-4|=2
    // v=3: i=3,j=2 -> |6-8|=2 ; v=5: i=4,j=2 -> |8-8|=0  => D*8 = 2
    val out = ks(
      Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0)),
      Seq(("a", 2.0), ("a", 3.0)))
    assert(out("a")._3 === 2L)
    assert(out("a")._4 === 0.25)
  }

  test("groups are independent; a shifted group flags alone") {
    val base = (1 to 200).map(i => ("x", i.toDouble)) ++
      (1 to 200).map(i => ("y", i.toDouble))
    val cur = (1 to 200).map(i => ("x", i.toDouble)) ++
      (1 to 200).map(i => ("y", i + 80.0)) // y shifted hard
    val out = ks(base, cur)
    assert(!out("x")._5)
    assert(out("y")._5)
  }

  test("a group present in only one sample is FLAGGED drifted with " +
      "null ks_d/threshold, not silently un-flagged by the 0/0") {
    val out = Drift.ksTest(
      frame(Seq(("both", 1.0), ("both", 2.0), ("base_only", 5.0))),
      frame(Seq(("both", 1.0), ("both", 2.0), ("cur_only", 9.0))),
      "v", Seq("g")).collect()
      .map(r => r.getString(0) -> r).toMap
    for (g <- Seq("base_only", "cur_only")) {
      assert(out(g).getBoolean(6), s"$g not flagged")
      assert(out(g).isNullAt(4) && out(g).isNullAt(5))
    }
    assert(!out("both").getBoolean(6))
    assert(!out("both").isNullAt(4))
  }

  test("partition-layout invariance (exact integers end to end)") {
    val base = (1 to 300).map(i => ("a", (i * 7 % 50).toDouble))
    val cur = (1 to 250).map(i => ("a", (i * 11 % 60).toDouble))
    val a = Drift.ksTest(frame(base).repartition(1),
      frame(cur).repartition(1), "v", Seq("g"))
      .collect().map(_.getLong(3)).toSeq
    val b = Drift.ksTest(frame(base).repartition(8),
      frame(cur).repartition(5), "v", Seq("g"))
      .collect().map(_.getLong(3)).toSeq
    assert(a === b)
  }
}
