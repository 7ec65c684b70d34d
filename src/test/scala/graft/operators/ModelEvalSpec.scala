package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Closed-form checks for the model-evaluation / monitoring family:
  * exact ROC-AUC (Mann–Whitney), per-group gains/lift table, CUSUM
  * level-shift detection.
  */
class ModelEvalSpec extends SparkSpec {

  // ---- rocAuc ----

  private def scored(rows: Seq[(String, Double, Boolean)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("s", DoubleType),
      StructField("y", BooleanType))),
    rows.map { case (g, s, y) => Row(g, s, y) })

  test("rocAuc: perfect separation is 1.0, inverted is 0.0") {
    val perfect = Seq(("a", 0.9, true), ("a", 0.8, true),
      ("a", 0.2, false), ("a", 0.1, false))
    val out = Analytics.rocAuc(scored(perfect), "g", col("s"), col("y"))
      .collect().head
    assert(out.getLong(1) === 2L && out.getLong(2) === 2L)
    assert(out.getDouble(3) === 1.0)
    assert(out.getDouble(4) === 1.0) // gini = 2·1 − 1
    val inverted = perfect.map { case (g, s, y) => (g, s, !y) }
    val inv = Analytics.rocAuc(scored(inverted), "g", col("s"), col("y"))
      .collect().head
    assert(inv.getDouble(3) === 0.0)
    assert(inv.getDouble(4) === -1.0)
  }

  test("rocAuc: ties count half — all-equal scores give exactly 0.5") {
    val rows = Seq(("a", 1.0, true), ("a", 1.0, true),
      ("a", 1.0, false), ("a", 1.0, false), ("a", 1.0, false))
    val out = Analytics.rocAuc(scored(rows), "g", col("s"), col("y"))
      .collect().head
    assert(out.getDouble(3) === 0.5)
    assert(out.getDouble(4) === 0.0)
  }

  test("rocAuc: hand-computed mixed case with a cross-class tie") {
    // pos scores {3, 2}, neg scores {1, 2}: wins 3, tie 1 of 4 pairs
    // → U = 3.5, AUC = 0.875, per group; an untouched second group
    // rides the same frame
    val rows = Seq(("a", 3.0, true), ("a", 2.0, true),
      ("a", 1.0, false), ("a", 2.0, false),
      ("b", 5.0, true), ("b", 4.0, false))
    val out = Analytics.rocAuc(scored(rows), "g", col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getDouble(3) === 0.875)
    assert(out("a").getDouble(4) === 0.75)
    assert(out("b").getDouble(3) === 1.0)
  }

  test("rocAuc: a one-class group reports null, not Infinity/NaN") {
    val rows = Seq(("a", 1.0, true), ("a", 2.0, true))
    val out = Analytics.rocAuc(scored(rows), "g", col("s"), col("y"))
      .collect().head
    assert(out.isNullAt(3) && out.isNullAt(4))
  }

  // ---- gainsTable ----

  private def units(rows: Seq[(String, Double, Boolean, Long)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("s", DoubleType),
      StructField("y", BooleanType),
      StructField("id", LongType))),
    rows.map { case (g, s, y, id) => Row(g, s, y, id) })

  test("gainsTable: two buckets, hand-computed rates, gain and lift") {
    // 10 units scored 10..1, responders at scores 10, 9, 8, 2
    val rows = (1 to 10).map(i =>
      ("g", i.toDouble, Set(10, 9, 8, 2).contains(i), i.toLong))
    val out = Analytics.gainsTable(units(rows), "g", col("s"),
        col("y"), col("id"), buckets = 2)
      .orderBy("bucket").collect()
    assert(out.length === 2)
    val b1 = out(0); val b2 = out(1)
    assert(b1.getLong(2) === 5L && b1.getLong(3) === 3L)
    assert(b2.getLong(2) === 5L && b2.getLong(3) === 1L)
    assert(b1.getDouble(4) === 0.6) // response rate
    assert(b1.getDouble(5) === 0.75) // cum gain: 3 of 4 captured
    assert(b1.getDouble(6) === 1.5) // lift vs base rate 0.4
    assert(b2.getDouble(5) === 1.0)
    assert(b2.getDouble(7) === 1.0) // full-population cum lift
  }

  test("gainsTable: ntile fill rule and per-group isolation") {
    // 5 rows, 2 buckets → first bucket takes 3 (the n mod b extra);
    // a second group with its own base rate doesn't bleed in
    val rows = (1 to 5).map(i => ("a", i.toDouble, i == 5, i.toLong)) ++
      (1 to 4).map(i => ("b", i.toDouble, true, (10 + i).toLong))
    val out = Analytics.gainsTable(units(rows), "g", col("s"),
        col("y"), col("id"), buckets = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(out(("a", 1)).getLong(2) === 3L)
    assert(out(("a", 2)).getLong(2) === 2L)
    // top bucket of "a" holds the only responder (score 5)
    assert(out(("a", 1)).getLong(3) === 1L)
    assert(out(("a", 2)).getLong(3) === 0L)
    // all-responder group: every rate and lift is exactly 1
    assert(out(("b", 1)).getDouble(4) === 1.0)
    assert(out(("b", 1)).getDouble(6) === 1.0)
  }

  test("gainsTable: equal scores cut deterministically by the tie column") {
    val rows = Seq(("g", 1.0, true, 1L), ("g", 1.0, false, 2L),
      ("g", 1.0, false, 3L), ("g", 1.0, false, 4L))
    val out = Analytics.gainsTable(units(rows), "g", col("s"),
        col("y"), col("id"), buckets = 2)
      .orderBy("bucket").collect()
    // ids 1,2 land in bucket 1 — the responder (id 1) with them
    assert(out(0).getLong(3) === 1L && out(1).getLong(3) === 0L)
  }

  // ---- cusumShift ----

  private def eventsAt(rows: Seq[(String, Long)]) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("p", LongType))),
    rows.map { case (g, p) => Row(g, p) })

  test("cusumShift: constant rate accumulates exactly zero") {
    val rows = for (p <- 1L to 6L; _ <- 1 to 3) yield ("g", p)
    val out = Analytics.cusumShift(eventsAt(rows), "g", col("p"))
      .collect()
    assert(out.length === 6)
    out.foreach { r =>
      assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0)
      assert(r.getInt(5) === 0 && r.getInt(6) === 0)
    }
  }

  test("cusumShift: step change — hand-computed one-sided sums") {
    // counts {3, 3, 9, 9} over periods 1..4: d = 4c − 24 →
    // cs {−12,−24,−12,0}; S⁺/n = {0, 0, 3, 6}, S⁻/n = {3, 6, 3, 0}
    val rows = (1L to 4L).flatMap(p =>
      Seq.fill(if (p <= 2) 3 else 9)(("g", p)))
    val out = Analytics.cusumShift(eventsAt(rows), "g", col("p"),
        threshold = 100.0)
      .orderBy("period").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 3L, 9L, 9L))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.0, 0.0, 3.0, 6.0))
    assert(out.map(_.getDouble(4)).toSeq === Seq(3.0, 6.0, 3.0, 0.0))
    out.foreach(r => assert(r.getInt(5) === 0 && r.getInt(6) === 0))
  }

  test("cusumShift: gap periods densify to zero-count rows") {
    val rows = Seq(("g", 1L), ("g", 4L))
    val out = Analytics.cusumShift(eventsAt(rows), "g", col("p"),
        threshold = 100.0)
      .orderBy("period").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L, 0L, 1L))
  }

  test("changePoint: a clean step locates exactly, with hand-computed " +
      "bridge and means") {
    // counts {2,2,2,8,8,8}: bridge B_t = |6·cs_t − 30·t| peaks at
    // t = 3 (54); before mean 2, after mean 8, height 54/6 = 9
    val rows = (1L to 6L).flatMap(p =>
      Seq.fill(if (p <= 3) 2 else 8)(("g", p)))
    val out = Analytics.changePoint(eventsAt(rows), "g", col("p"))
      .collect().head
    assert(out.getLong(1) === 6L && out.getLong(2) === 30L)
    assert(out.getLong(3) === 3L) // split index
    assert(out.getLong(4) === 3L) // period label
    assert(out.getDouble(5) === 2.0 && out.getDouble(6) === 8.0)
    assert(out.getDouble(7) === 9.0)
    assert(math.abs(out.getDouble(8) - 9.0 / math.sqrt(5.0)) < 1e-4)
  }

  test("changePoint: ties break to the smallest split; gaps densify") {
    // observed only at periods 1 and 4 → grid {1,0,0,1}; B ties at
    // t = 1 and t = 3 → smallest wins
    val rows = Seq(("g", 1L), ("g", 4L))
    val out = Analytics.changePoint(eventsAt(rows), "g", col("p"))
      .collect().head
    assert(out.getLong(1) === 4L)
    assert(out.getLong(3) === 1L)
    assert(out.getDouble(5) === 1.0)
    assert(out.getDouble(6) === 0.3333)
  }

  test("cusumShift: the threshold fires on a genuine level shift") {
    // 20 quiet periods at 1, then 10 periods at 21 — the upward
    // accumulation must cross 5·√mean well before the end
    val rows = (1L to 20L).map(p => ("g", p)) ++
      (for (p <- 21L to 30L; _ <- 1 to 21) yield ("g", p))
    val out = Analytics.cusumShift(eventsAt(rows), "g", col("p"))
      .orderBy("period").collect()
    assert(out.exists(_.getInt(5) === 1))
    // and the flag appears only in the shifted regime
    assert(out.filter(_.getInt(5) === 1).forall(_.getLong(1) >= 21L))
  }
}
