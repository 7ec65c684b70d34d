package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[QualityModel.rocAuc]] — the MW rank identity's closed forms
  * (perfect, random-tie, inverted), the single-class guard, and the
  * q293 reading on the real corpus (the English-stopword component
  * of the quality score makes it an is-English ranker).
  */
class RocAucSpec extends SparkSpec {

  private def scoredDf(rows: (String, Double, Boolean)*) = df(
    StructType(Seq(
      StructField("g", StringType),
      StructField("s", DoubleType),
      StructField("y", BooleanType))),
    rows.map { case (g, s, y) => Row(g, s, y) })

  private def auc(rows: (String, Double, Boolean)*) =
    QualityModel.rocAuc(scoredDf(rows: _*), Seq("g"),
      col("s"), col("y"))

  test("perfect separation: AUC = 1, Gini = 1") {
    val out = auc(("g", 0.9, true), ("g", 0.8, true),
      ("g", 0.2, false), ("g", 0.1, false)).head()
    assert(out.getLong(1) == 2L && out.getLong(2) == 2L)
    assert(out.getDouble(3) == 1.0 && out.getDouble(4) == 1.0)
  }

  test("all scores tied: AUC = 0.5 exactly (tie half-credit), " +
      "Gini = 0") {
    val out = auc(("g", 0.5, true), ("g", 0.5, false),
      ("g", 0.5, true), ("g", 0.5, false)).head()
    assert(out.getDouble(3) == 0.5 && out.getDouble(4) == 0.0)
  }

  test("inverted ranker: AUC = 0, Gini = -1") {
    val out = auc(("g", 0.1, true), ("g", 0.9, false)).head()
    assert(out.getDouble(3) == 0.0 && out.getDouble(4) == -1.0)
  }

  test("hand-computed mix: pos {3,1} neg {2} gives AUC = 0.5") {
    // ranks 1,2,3: R+ = 1+3 = 4; AUC = (4 - 3)/ (2*1) = 0.5
    val out = auc(("g", 0.3, true), ("g", 0.1, true),
      ("g", 0.2, false)).head()
    assert(out.getDouble(3) == 0.5)
  }

  test("single-class groups emit null AUC") {
    val out = auc(("a", 0.5, true), ("a", 0.6, true),
      ("b", 0.5, false))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").isNullAt(3) && out("b").isNullAt(3))
  }

  test("q293 on the real corpus: the bias audit reads AUCs " +
      "scattered AROUND 0.5 — the quality score is not an English " +
      "classifier in disguise — and Gini is exactly 2*AUC - 1") {
    graft.core.CacheScope.withScope {
      val rows = graft.registry.AnalyticsRegistry
        .qualityAucQ(spark, "/root/testdata/sf0.001").collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val a = r.getDouble(3)
        assert(a >= 0.0 && a <= 1.0)
        assert(math.abs(r.getDouble(4) - (a * 2.0 - 1.0)) < 2e-6)
      }
      // scattered around 0.5, not systematically above it: both
      // sides of the coin must appear
      assert(rows.exists(_.getDouble(3) > 0.5))
      assert(rows.exists(_.getDouble(3) < 0.5))
      val mean = rows.map(_.getDouble(3)).sum / rows.length
      assert(mean > 0.3 && mean < 0.7, s"mean auc $mean")
    }
  }
}
