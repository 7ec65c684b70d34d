package graft.sampling

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class NegativeSampleSpec extends SparkSpec {

  private def inter(rows: Seq[(Long, Long)]) = df(
    StructType(Seq(
      StructField("user", LongType),
      StructField("item", LongType))),
    rows.map { case (u, i) => Row(u, i) })

  private def items(ids: Seq[Long]) = df(
    StructType(Seq(StructField("id", LongType))),
    ids.map(Row(_)))

  private val catalog = items(1L to 50L)

  test("negatives are disjoint from interactions, at most k per user") {
    val in = inter(Seq((1L, 1L), (1L, 2L), (2L, 3L)))
    val out = Sampling.negativeSample(in, "user", "item", catalog,
      "id", k = 5).collect()
    val byUser = out.groupBy(_.getLong(0))
    assert(byUser.keySet === Set(1L, 2L))
    byUser.foreach { case (_, rows) => assert(rows.length <= 5) }
    val seen = Set((1L, 1L), (1L, 2L), (2L, 3L))
    out.foreach { r =>
      assert(!seen.contains((r.getLong(0), r.getLong(1))),
        "sampled an interacted item")
    }
    // ranks are 1..n dense per user in slot order
    byUser.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq ===
        (1 to rows.length))
    }
  }

  test("deterministic across reruns and partitionings") {
    val in = inter(Seq((1L, 1L), (2L, 3L), (3L, 9L)))
    def run(parts: Int) =
      Sampling.negativeSample(in.repartition(parts), "user", "item",
          catalog.repartition(parts), "id", k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .toSet
    assert(run(1) === run(7))
    assert(run(7) === run(7))
  }

  test("salt change draws an independent sample") {
    val in = inter((1L to 20L).map(u => (u, 1L)))
    def run(salt: String) =
      Sampling.negativeSample(in, "user", "item", catalog, "id",
          k = 5, salt = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run("a") !== run("b"))
  }

  test("a heavy interactor short-falls deterministically") {
    // user 1 has interacted with 48 of 50 items: 20 draws can only
    // surface the 2 unseen ones (possibly fewer if never drawn)
    val in = inter((1L to 48L).map(i => (1L, i)))
    val out = Sampling.negativeSample(in, "user", "item", catalog,
      "id", k = 5).collect()
    assert(out.length <= 2)
    out.foreach(r => assert(r.getLong(1) > 48L))
  }

  test("null users and null items are ignored") {
    val in = df(
      StructType(Seq(
        StructField("user", LongType, nullable = true),
        StructField("item", LongType, nullable = true))),
      Seq(Row(1L, 2L), Row(null, 3L), Row(2L, null)))
    val out = Sampling.negativeSample(in, "user", "item", catalog,
      "id", k = 3).collect()
    // user 2 (null item) is still a user; null user is not
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L))
  }
}
