package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class Scd2LookupSpec extends SparkSpec {

  private def obs(rows: Seq[(Long, String, Int)]) = df(
    StructType(Seq(
      StructField("k", LongType),
      StructField("tier", StringType),
      StructField("t", IntegerType))),
    rows.map { case (k, a, t) => Row(k, a, t) })

  private def facts(rows: Seq[(Long, Long, Int)]) = df(
    StructType(Seq(
      StructField("fid", LongType),
      StructField("k", LongType),
      StructField("t", IntegerType))),
    rows.map { case (f, k, t) => Row(f, k, t) })

  // key 1: gold [10, 30), silver [30, open) ; key 2: basic [5, open)
  private val versions = StarSchemaBuilder.scd2Versions(
    obs(Seq((1L, "gold", 10), (1L, "gold", 20), (1L, "silver", 30),
      (2L, "basic", 5))),
    keyCols = Seq("k"), attrCols = Seq("tier"), orderCol = "t")

  private def lookup(fs: Seq[(Long, Long, Int)]) =
    StarSchemaBuilder.scd2Lookup(facts(fs), versions, Seq("k"), "t",
        Seq("tier"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(3)), if (r.isNullAt(4)) -1
          else r.getInt(4))))
      .toMap

  test("each fact lands in exactly the version valid at its time; " +
      "boundaries belong to the newer version") {
    val out = lookup(Seq(
      (100L, 1L, 15), // inside gold
      (101L, 1L, 30), // exactly at the change -> silver
      (102L, 1L, 99), // open current version
      (103L, 2L, 5))) // exactly at first valid_from
    assert(out(100L) === ((Some("gold"), 1)))
    assert(out(101L) === ((Some("silver"), 2)))
    assert(out(102L) === ((Some("silver"), 2)))
    assert(out(103L) === ((Some("basic"), 1)))
  }

  test("facts before the first version or with unknown keys keep " +
      "null version columns; no fact ever matches twice") {
    val fs = Seq((100L, 1L, 5), (101L, 9L, 50))
    val out = lookup(fs)
    assert(out(100L) === ((None, -1)))
    assert(out(101L) === ((None, -1)))
    assert(StarSchemaBuilder.scd2Lookup(facts(fs), versions, Seq("k"),
      "t", Seq("tier")).count() === 2L)
  }

  test("inner mode drops unmatched facts") {
    val n = StarSchemaBuilder.scd2Lookup(
      facts(Seq((100L, 1L, 5), (101L, 1L, 15))), versions, Seq("k"),
      "t", Seq("tier"), how = "inner").count()
    assert(n === 1L)
  }
}
