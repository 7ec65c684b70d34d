package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CompressibilitySpec extends SparkSpec {

  private def docs(rows: (Int, String)*) = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("text", StringType, nullable = true))),
    rows.map { case (i, t) => Row(i, t) })

  test("repetitive text compresses far below natural prose; ratios are " +
      "in (0, ~1.2]") {
    val natural = "The committee reviewed quarterly filings before " +
      "adjusting projected revenue for the upcoming fiscal period, " +
      "noting unusual variance across regional subsidiaries."
    val spam = "buy now " * 40
    val out = Compressibility.deflateRatio(
        docs((1, natural), (2, spam)), "id", "text")
      .orderBy("id").collect()
    val rNatural = out(0).getAs[Double]("ratio")
    val rSpam = out(1).getAs[Double]("ratio")
    assert(rSpam < rNatural / 2, s"spam $rSpam vs natural $rNatural")
    assert(rNatural > 0 && rNatural <= 1.2)
    assert(out(0).getAs[Int]("raw_len") == natural.length)
  }

  test("deflateRatio is deterministic and null-safe") {
    val d = docs((1, "some text here"), (2, null), (3, ""))
    val a = Compressibility.deflateRatio(d, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Compressibility.deflateRatio(d, "id", "text")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a(1)(3) == null) // null text → null ratio
    assert(a(2)(3) == null) // empty text → null ratio, no 0/0
  }

  test("doubling a document always improves its ratio (window finds the " +
      "repeat) on the sf0.001 corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val single = Compressibility.deflateRatio(d, "doc_id", "text")
      .select(col("id"), col("ratio").as("r1"))
    val doubled = Compressibility.deflateRatio(
        d.select(col("doc_id"), concat(col("text"), col("text")).as("text")),
        "doc_id", "text")
      .select(col("id"), col("ratio").as("r2"))
    val joined = single.join(doubled, "id")
    assert(joined.where(col("r2") >= col("r1")).count() == 0)
  }
}
