package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SCD type-2 derivation ([[StarSchemaBuilder.scd2Versions]]) and the
  * path-based upsert ([[StarSchemaBuilder.upsertDimensionScd2]]).
  */
class Scd2Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("attr", StringType, nullable = true),
    StructField("seq", IntegerType),
    StructField("tie", IntegerType)))

  private def stream(rows: Row*) = df(schema, rows)

  private def versions(d: org.apache.spark.sql.DataFrame) =
    StarSchemaBuilder.scd2Versions(
      d, Seq("k"), Seq("attr"), "seq", Seq("tie"))

  private def collect(d: org.apache.spark.sql.DataFrame) =
    d.orderBy("k", "version_n")
      .select("k", "version_n", "attr", "valid_from", "valid_to",
        "is_current")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        r.getBoolean(5)))

  test("runs of identical attributes collapse into one version") {
    val out = collect(versions(stream(
      Row(1, "A", 1, 0), Row(1, "A", 2, 0), Row(1, "B", 3, 0),
      Row(1, "B", 4, 0), Row(1, "A", 5, 0))))
    assert(out.toSeq == Seq(
      (1, 1, "A", 1, 3, false),
      (1, 2, "B", 3, 5, false),
      (1, 3, "A", 5, -1, true)))
  }

  test("single observation yields one open current version") {
    val out = collect(versions(stream(Row(7, "X", 42, 0))))
    assert(out.toSeq == Seq((7, 1, "X", 42, -1, true)))
  }

  test("null attributes compare null-safely (null run is ONE version)") {
    val out = collect(versions(stream(
      Row(1, null, 1, 0), Row(1, null, 2, 0), Row(1, "A", 3, 0))))
    assert(out.toSeq == Seq(
      (1, 1, null, 1, 3, false), (1, 2, "A", 3, -1, true)))
  }

  test("same-instant observations break ties on the tieBreak column") {
    // seq=1 carries both B (tie=2) and A (tie=1): A observes first, B
    // opens at seq=1, and the later identical B collapses into it
    val out = collect(versions(stream(
      Row(1, "B", 1, 2), Row(1, "A", 1, 1), Row(1, "B", 2, 1))))
    assert(out.toSeq == Seq(
      (1, 1, "A", 1, 1, false),
      (1, 2, "B", 1, -1, true)))
  }

  test("keys version independently; exactly one current row per key") {
    val d = versions(stream(
      Row(1, "A", 1, 0), Row(1, "B", 2, 0),
      Row(2, "C", 1, 0), Row(2, "C", 5, 0)))
    val current = d.where(col("is_current")).orderBy("k").collect()
    assert(current.length == 2)
    assert(d.count() == 3) // key 2's identical re-observation collapsed
  }

  test("one exchange on the key: no second shuffle between windows") {
    val plan = versions(stream(Row(1, "A", 1, 0), Row(1, "B", 2, 0)))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key exchange, plan:\n$plan")
  }

  test("multi-attribute change detection: any tracked column triggers") {
    val s2 = StructType(Seq(
      StructField("k", IntegerType),
      StructField("a1", StringType), StructField("a2", IntegerType),
      StructField("seq", IntegerType)))
    val d = df(s2, Seq(
      Row(1, "x", 10, 1), Row(1, "x", 20, 2), Row(1, "y", 20, 3),
      Row(1, "y", 20, 4)))
    val out = StarSchemaBuilder
      .scd2Versions(d, Seq("k"), Seq("a1", "a2"), "seq")
    assert(out.count() == 3)
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_scd2").toString

  test("upsert: insert, attribute change, no-op, and idempotency") {
    val path = tmpDir() + "/dim"
    def up(rows: Row*): Long =
      StarSchemaBuilder.upsertDimensionScd2(
        spark, path, stream(rows: _*), Seq("k"), Seq("attr"), "seq")
    assert(up(Row(1, "A", 1, 0)) == 1)
    // change opens a version and closes the old one
    assert(up(Row(1, "B", 5, 0)) == 2)
    val afterChange = spark.read.parquet(path)
      .orderBy("version_n").collect()
    assert(afterChange.map(_.getAs[String]("attr")).toSeq == Seq("A", "B"))
    assert(afterChange.head.getAs[Int]("valid_to") == 5)
    assert(!afterChange.head.getAs[Boolean]("is_current"))
    assert(afterChange.last.getAs[Boolean]("is_current"))
    // a no-op update (same attrs, later time) opens nothing
    assert(up(Row(1, "B", 9, 0)) == 2)
    // idempotent: re-applying an already-seen update changes nothing
    assert(up(Row(1, "B", 5, 0)) == 2)
  }

  test("versions carry last_seen: the final collapsed observation") {
    val out = versions(stream(
      Row(1, "A", 1, 0), Row(1, "A", 5, 0), Row(1, "B", 7, 0),
      Row(1, "B", 9, 0)))
      .orderBy("version_n")
      .select("attr", "valid_from", "last_seen").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq(("A", 1, 5), ("B", 7, 9)))
  }

  test("upsert: late arrival INSIDE a version's span re-opens the " +
      "old attributes afterwards (endpoint retention)") {
    val path = tmpDir() + "/dim"
    def up(rows: Row*): Long =
      StarSchemaBuilder.upsertDimensionScd2(
        spark, path, stream(rows: _*), Seq("k"), Seq("attr"), "seq")
    // A observed at 1 and at 3 (same attrs → one version, endpoints
    // retained); B arrives late at 2, in the middle of A's span
    up(Row(1, "A", 1, 0), Row(1, "A", 3, 0))
    assert(up(Row(1, "B", 2, 0)) == 3)
    val hist = spark.read.parquet(path).orderBy("version_n").collect()
    assert(hist.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "A"))
    assert(hist(0).getAs[Int]("valid_to") == 2)
    assert(hist(1).getAs[Int]("valid_to") == 3)
    // current state is A again — NOT the late-arriving B
    assert(hist(2).getAs[Boolean]("is_current") &&
      hist(2).getAs[String]("attr") == "A")
  }

  test("upsert: same-orderCol conflicting observations tie-break on " +
      "the attribute values — identical history on every re-derivation " +
      "regardless of input order") {
    // two conflicting observations at the SAME instant: without a
    // total tie-break the winner depends on partitioning/input order
    // and re-derivations disagree
    val histories = Seq(
      Seq(Row(1, "B", 5, 0), Row(1, "A", 5, 0), Row(1, "C", 9, 0)),
      Seq(Row(1, "A", 5, 0), Row(1, "C", 9, 0), Row(1, "B", 5, 0)),
      Seq(Row(1, "C", 9, 0), Row(1, "B", 5, 0), Row(1, "A", 5, 0)))
      .map { rows =>
        val path = tmpDir() + "/dim"
        StarSchemaBuilder.upsertDimensionScd2(
          spark, path, stream(rows: _*), Seq("k"), Seq("attr"), "seq")
        // idempotency under re-derivation: upsert the same evidence
        // again — the derived history must not move
        StarSchemaBuilder.upsertDimensionScd2(
          spark, path, stream(rows: _*), Seq("k"), Seq("attr"), "seq")
        spark.read.parquet(path).orderBy("version_n")
          .select("attr", "valid_from", "valid_to").collect()
          .map(_.toSeq).toSeq
      }
    assert(histories.distinct.size == 1,
      s"tie order leaked into the derived history:\n$histories")
  }

  test("upsert: late-arriving observation splices into history") {
    val path = tmpDir() + "/dim"
    def up(rows: Row*): Long =
      StarSchemaBuilder.upsertDimensionScd2(
        spark, path, stream(rows: _*), Seq("k"), Seq("attr"), "seq")
    up(Row(1, "A", 1, 0))
    up(Row(1, "C", 10, 0))
    // a late B at seq=5 lands BETWEEN the existing versions
    assert(up(Row(1, "B", 5, 0)) == 3)
    val hist = spark.read.parquet(path).orderBy("version_n").collect()
    assert(hist.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "C"))
    assert(hist(0).getAs[Int]("valid_to") == 5)
    assert(hist(1).getAs[Int]("valid_to") == 10)
    assert(hist(2).getAs[Boolean]("is_current"))
  }
}
