package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-funnel semantics ([[Analytics.funnel]] /
  * [[Analytics.funnelCounts]]): strict ordering, per-entity
  * independence, and the single-exchange plan.
  */
class FunnelSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("u", IntegerType),
    StructField("t", IntegerType),
    StructField("e", StringType)))

  private def events(rows: (Int, Int, String)*) =
    df(schema, rows.map { case (u, t, e) => Row(u, t, e) })

  private val steps = Seq("view", "click", "buy")

  private def run(rows: (Int, Int, String)*) =
    Analytics.funnel(events(rows: _*), "u", "t", "e", steps)
      .orderBy("entity").collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))

  test("in-order events reach every step at the earliest valid time") {
    assert(run((1, 1, "view"), (1, 5, "click"), (1, 9, "buy")).toSeq ==
      Seq((1, 1, 5, 9)))
  }

  test("out-of-order steps do NOT count: click before any view") {
    assert(run((1, 1, "click"), (1, 2, "view"), (1, 3, "buy")).toSeq ==
      Seq((1, 2, -1, -1)))
  }

  test("a later re-occurrence completes the funnel") {
    // click at 1 invalid; view 2; click 4 valid; buy 3 precedes the
    // valid click so the funnel stalls at click
    assert(run((1, 1, "click"), (1, 2, "view"), (1, 3, "buy"),
      (1, 4, "click")).toSeq == Seq((1, 2, 4, -1)))
    // ...and a buy after the valid click completes it
    assert(run((1, 1, "click"), (1, 2, "view"), (1, 3, "buy"),
      (1, 4, "click"), (1, 6, "buy")).toSeq == Seq((1, 2, 4, 6)))
  }

  test("same-timestamp events are strictly ordered: no same-instant hop") {
    // click at the same ts as the first view does not count
    assert(run((1, 5, "view"), (1, 5, "click"), (1, 9, "buy")).toSeq ==
      Seq((1, 5, -1, -1)))
  }

  test("earliest valid chain wins over later repeats") {
    assert(run((1, 1, "view"), (1, 2, "click"), (1, 3, "view"),
      (1, 4, "click"), (1, 5, "buy")).toSeq == Seq((1, 1, 2, 5)))
  }

  test("entities are independent; unrelated event types ignored") {
    val out = run(
      (1, 1, "view"), (1, 2, "noise"), (1, 3, "click"),
      (2, 1, "buy"), (2, 2, "view"),
      (3, 1, "noise"))
    assert(out.toSeq == Seq((1, 1, 3, -1), (2, 2, -1, -1), (3, -1, -1, -1)))
  }

  test("funnelCounts: reached counts and conversion vs step 1") {
    val out = Analytics.funnelCounts(
        events(
          (1, 1, "view"), (1, 2, "click"), (1, 3, "buy"),
          (2, 1, "view"), (2, 2, "click"),
          (3, 1, "view"),
          (4, 1, "click")),
        "u", "t", "e", steps)
      .orderBy("step_n").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 2L, 0.666667),
      (3, "buy", 1L, 0.333333)))
  }

  test("one exchange serves all step windows and the final rollup") {
    val plan = Analytics.funnel(
        events((1, 1, "view"), (1, 2, "click")), "u", "t", "e", steps)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }
}
