package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QualityModelSpec extends SparkSpec {

  import QualityModel._

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("text", StringType, nullable = true)))

  private def texts(rows: (Int, String)*) =
    df(schema, rows.map { case (i, t) => Row(i, t) })

  private def w(m: (String, Double)*) = Weights(m.toMap, bias = 0.0)

  test("score is σ(w·x+b): bias-only model scores exactly 0.5") {
    val out = texts((1, "whatever text"))
      .select(score(col("text"), Weights(Map.empty, 0.0)))
      .head().getDouble(0)
    assert(out == 0.5)
  }

  test("negative punct weight: noisier text scores lower") {
    val d = texts(
      (1, "clean plain words only here"),
      (2, "no!!ise?? ###text$$ %%junk&&"))
    val rows = d.select(col("id"),
        score(col("text"), w("punct_ratio" -> -8.0)))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) > rows(1).getDouble(1))
  }

  test("log_tokens rewards volume with diminishing returns") {
    val d = texts(
      (1, "one two three"),
      (2, Seq.fill(50)("word").mkString(" ")),
      (3, Seq.fill(500)("word").mkString(" ")))
    val sc = d.select(col("id"),
        score(col("text"), w("log_tokens" -> 1.0)))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(sc(0) < sc(1) && sc(1) < sc(2))
    assert(sc(2) - sc(1) < sc(1) - sc(0)) // log-dampened
  }

  test("empty and whitespace text get finite scores (features coalesce)") {
    val out = texts((1, ""), (2, "   "), (3, "...!!!"))
      .select(score(col("text"),
        Weights(Map("punct_ratio" -> -1.0, "stop_ratio" -> 1.0,
          "mean_word_len" -> 0.5, "log_tokens" -> 1.0), 0.1)))
      .collect().map(_.getDouble(0))
    assert(out.forall(s => !s.isNaN && s > 0.0 && s < 1.0))
  }

  test("unknown feature names are rejected") {
    intercept[IllegalArgumentException] {
      Weights(Map("nope" -> 1.0), 0.0)
    }
  }

  private val scoredSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("g", StringType, nullable = true),
    StructField("s", DoubleType)))

  test("adaptive floor: each group keeps its own >= p-quantile rows") {
    // group a: 0.1..1.0 (p50 cutoff 0.55 → keeps 0.6+);
    // group b: 10x higher scores — a global cutoff would drop ALL of a
    val rows = (1 to 10).map(i => Row(i, "a", i / 10.0)) ++
      (11 to 20).map(i => Row(i, "b", i - 10.0))
    val kept = QualityModel.adaptiveQualityFloor(
        df(scoredSchema, rows), "g", "s", 0.5, exact = true)
      .orderBy("id").collect()
    assert(kept.count(_.getString(1) == "a") == 5)
    assert(kept.count(_.getString(1) == "b") == 5)
    // boundary row AT the cutoff is kept (>=, integer-index quantile)
    assert(kept.filter(_.getString(1) == "a").map(_.getInt(0)).min == 6)
  }

  test("adaptive floor: bounded-state default equals exact mode when " +
      "the quantile lands on a data value") {
    // n = 11 per group, p = 0.5 → exact interpolated quantile IS the
    // middle data value, and the GK sketch returns that same value
    val rows = (0 to 10).map(i => Row(i, "a", i / 10.0)) ++
      (11 to 21).map(i => Row(i, "b", (i - 11) * 3.0))
    val d = df(scoredSchema, rows)
    val approx = QualityModel.adaptiveQualityFloor(d, "g", "s", 0.5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val ex = QualityModel.adaptiveQualityFloor(d, "g", "s", 0.5,
        exact = true)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(approx == ex)
  }

  test("adaptive floor: approx cutoff keeps ~(1-p) of a large group " +
      "(rank error bounded by n/accuracy)") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 5000).map(i => Row(i, "a", rng.nextDouble()))
    val kept = QualityModel.adaptiveQualityFloor(
      df(scoredSchema, rows), "g", "s", 0.2).count()
    // accuracy 10000 on 5000 rows → rank error ≤ 1
    assert(math.abs(kept - 4000L) <= 2, s"kept $kept of 5000")
  }

  test("null group keys form their own group and survive") {
    val rows = Seq(Row(1, null, 1.0), Row(2, null, 2.0),
      Row(3, "a", 5.0))
    val kept = QualityModel.adaptiveQualityFloor(
      df(scoredSchema, rows), "g", "s", 0.4)
    assert(kept.where(col("g").isNull).count() >= 1)
    assert(kept.where(col("g") === "a").count() == 1)
  }

  test("cutoff column is appended and constant within a group") {
    val rows = (1 to 4).map(i => Row(i, "a", i.toDouble))
    val cuts = QualityModel.adaptiveQualityFloor(
        df(scoredSchema, rows), "g", "s", 0.25)
      .select("cutoff").distinct().collect()
    assert(cuts.length == 1)
  }
}
