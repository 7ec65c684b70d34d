package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Sampling.stratifiedKFold]] — the balance-guaranteed CV splitter. */
class KFoldSpec extends SparkSpec {

  private def units(rows: Seq[(Long, String)]) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType))),
    rows.map { case (id, s) => Row(id, s) })

  test("folds are balanced ±1 WITHIN every stratum, cover every row, " +
      "and are deterministic") {
    // strata of size 10 and 7 over 3 folds: 10 → {4,3,3}, 7 → {3,2,2}
    val rows = (1L to 10L).map(i => i -> "a") ++
      (11L to 17L).map(i => i -> "b")
    val out = Sampling.stratifiedKFold(units(rows), "id", "s", k = 3)
    val counts = out.groupBy("s", "fold").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(counts.filter(_._1._1 == "a").values.toSeq.sorted ===
      Seq(3L, 3L, 4L))
    assert(counts.filter(_._1._1 == "b").values.toSeq.sorted ===
      Seq(2L, 2L, 3L))
    assert(out.count() === 17L) // every row, exactly once
    val a = out.orderBy("id").collect().map(_.getInt(2)).toSeq
    val b = Sampling.stratifiedKFold(units(rows), "id", "s", k = 3)
      .orderBy("id").collect().map(_.getInt(2)).toSeq
    assert(a === b)
  }

  test("a different salt reshuffles; a plain mod-k hash would not " +
      "guarantee the ±1 bound this asserts") {
    val rows = (1L to 30L).map(i => i -> "x")
    val s1 = Sampling.stratifiedKFold(units(rows), "id", "s", k = 4,
      salt = "s1").orderBy("id").collect().map(_.getInt(2)).toSeq
    val s2 = Sampling.stratifiedKFold(units(rows), "id", "s", k = 4,
      salt = "s2").orderBy("id").collect().map(_.getInt(2)).toSeq
    assert(s1 !== s2)
    // 30 over 4 folds: {8,8,7,7}
    assert(s1.groupBy(identity).values.map(_.size).toSeq.sorted ===
      Seq(7, 7, 8, 8))
  }
}
