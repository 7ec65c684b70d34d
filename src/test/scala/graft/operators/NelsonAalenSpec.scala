package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Analytics.nelsonAalen]] — hand-computed hazard increments,
  * censoring semantics, and the Breslow ≥ Kaplan–Meier inequality on
  * the real q191/q316 churn frame.
  */
class NelsonAalenSpec extends SparkSpec {

  private def subjects(rows: (String, Long, Boolean)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("t", LongType),
      StructField("e", BooleanType))),
    rows.map { case (g, t, e) => Row(g, t, e) })

  private def na(rows: (String, Long, Boolean)*) =
    Analytics.nelsonAalen(subjects(rows: _*), "g", col("t"), col("e"))

  test("hand-computed: events at t=1 (1 of 3) and t=2 (1 of 2) -> " +
      "H = 1/3 then 1/3 + 1/2") {
    val out = na(("g", 1L, true), ("g", 2L, true), ("g", 3L, false))
      .orderBy("t").collect()
    // nano-floor: 1/3 -> 333333333, 1/2 -> 500000000 (exact units)
    assert(out(0).getLong(5) == 333333333L)
    assert(out(1).getLong(5) == 833333333L)
    assert(out(2).getLong(2) == 1L && out(2).getLong(4) == 1L)
    assert(out(2).getLong(5) == 833333333L) // censoring adds nothing
  }

  test("pure censoring: zero hazard at every timepoint") {
    val out = na(("g", 1L, false), ("g", 2L, false)).collect()
    assert(out.forall(_.getLong(5) == 0L))
    assert(out.forall(_.getDouble(6) == 1.0))
  }

  test("q316 on the real corpus: Breslow exp(-H) >= the KM curve " +
      "at every timepoint, and both hit the same risk sets") {
    graft.core.CacheScope.withScope {
      val naRows = graft.registry.AnalyticsRegistry
        .nelsonAalenQ(spark, "/root/testdata/sf0.001")
        .select("c_mktsegment", "t", "survival_na", "n_at_risk")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getDouble(2), r.getLong(3))).toMap
      val kmRows = graft.registry.AnalyticsRegistry
        .kaplanMeierQ(spark, "/root/testdata/sf0.001")
        .select("c_mktsegment", "t", "survival", "n_at_risk")
        .collect()
      assert(kmRows.nonEmpty && kmRows.length == naRows.size)
      kmRows.foreach { r =>
        val key = (r.getString(0), r.getLong(1))
        val (sNa, nNa) = naRows(key)
        assert(nNa == r.getLong(3), s"risk set differs at $key")
        assert(sNa >= r.getDouble(2) - 1e-6,
          s"Breslow $sNa < KM ${r.getDouble(2)} at $key")
      }
    }
  }
}
