package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FrequentSequencesSpec extends SparkSpec {

  private def events(rows: Seq[(Long, Long, String)]) = df(
    StructType(Seq(
      StructField("user", LongType),
      StructField("seq", LongType),
      StructField("state", StringType, nullable = true))),
    rows.map { case (u, s, st) => Row(u, s, st) })

  private def run(rows: Seq[(Long, Long, String)], n: Int = 3,
      minSupport: Long = 1L) =
    Analytics.frequentSequences(events(rows), "user", "state",
        Seq(col("seq").asc), n, minSupport)
      .collect()
      .map(r => (
        (0 until n).map(i => r.getString(i)).mkString(">"),
        r.getLong(n), r.getDouble(n + 1)))
      .toSet

  test("contiguous trigrams counted by distinct users with support") {
    // u1: a b c d  -> abc, bcd ; u2: a b c -> abc ; u3: x y -> none
    val rows = Seq[(Long, Long, String)](
      (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),
      (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
      (3, 1, "x"), (3, 2, "y"))
    // eligible keys (>= 3 events): u1, u2 -> denominator 2
    assert(run(rows) === Set(
      ("a>b>c", 2L, 1.0), ("b>c>d", 1L, 0.5)))
  }

  test("a bot repeating one n-gram counts once per key") {
    val bot = (1 to 20).flatMap(i =>
      Seq[(Long, Long, String)](
        (9, i * 3L, "a"), (9, i * 3L + 1, "b"), (9, i * 3L + 2, "c")))
    val honest = Seq[(Long, Long, String)](
      (1, 1, "a"), (1, 2, "b"), (1, 3, "c"))
    val out = run(bot ++ honest).filter(_._1 == "a>b>c")
    assert(out.map(_._2) === Set(2L)) // 2 users, not 21 occurrences
  }

  test("minSupport prunes below-threshold sequences") {
    val rows = Seq[(Long, Long, String)](
      (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),
      (2, 1, "a"), (2, 2, "b"), (2, 3, "c"))
    val out = run(rows, minSupport = 2L)
    assert(out.map(_._1) === Set("a>b>c"))
  }

  test("null states and null keys are excluded from runs") {
    val rows = Seq[(Long, Long, String)](
      (1, 1, "a"), (1, 2, null), (1, 3, "b"), (1, 4, "c"), (1, 5, "d"))
    // nulls are filtered BEFORE the lag, so the run is a b c d
    assert(run(rows).map(_._1) === Set("a>b>c", "b>c>d"))
  }

  test("bigrams (n = 2) work and eligibility follows n") {
    val rows = Seq[(Long, Long, String)](
      (1, 1, "a"), (1, 2, "b"),
      (2, 1, "a")) // one event: not eligible at n=2
    assert(run(rows, n = 2) === Set(("a>b", 1L, 1.0)))
  }
}
