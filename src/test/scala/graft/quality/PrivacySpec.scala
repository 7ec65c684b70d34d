package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PrivacySpec extends SparkSpec {

  private def people(rows: Seq[(String, String, Long)]) = df(
    StructType(Seq(
      StructField("zip", StringType, nullable = true),
      StructField("band", StringType),
      StructField("id", LongType))),
    rows.map { case (z, b, i) => Row(z, b, i) })

  private val sample = people(Seq(
    ("94110", "30s", 1L), ("94110", "30s", 2L), ("94110", "30s", 3L),
    ("94110", "40s", 4L),
    ("10001", "30s", 5L), ("10001", "30s", 6L),
    (null, "40s", 7L)))

  test("class-size histogram with violation flags") {
    val out = Privacy.kAnonymityReport(sample, Seq("zip", "band"), 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3))))
      .toMap
    // sizes: 3 (94110/30s), 2 (10001/30s), 1 x2 (94110/40s, null/40s)
    assert(out(3L) === ((1L, 3L, false)))
    assert(out(2L) === ((1L, 2L, true)))
    assert(out(1L) === ((2L, 2L, true)))
  }

  test("k-anonymous table has zero flagged rows") {
    val ok = people((1L to 12L).map(i =>
      (if (i <= 6) "A" else "B", "30s", i)))
    val flagged = Privacy.kAnonymityReport(ok, Seq("zip", "band"), 5)
      .where("violates").count()
    assert(flagged === 0L)
  }

  test("violators lists exactly the members of small classes, with " +
      "null quasi-identifiers forming their own class") {
    val v = Privacy.kAnonymityViolators(sample, Seq("zip", "band"), 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(v.keySet === Set(4L, 5L, 6L, 7L))
    assert(v(5L) === 2L) // class size travels with the row
    assert(v(7L) === 1L) // the null-zip class is linkable too
  }
}
