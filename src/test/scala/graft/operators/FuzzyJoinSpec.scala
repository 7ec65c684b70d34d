package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Symmetric-delete fuzzy join ([[Analytics.fuzzyJoin]]): candidate
  * completeness vs the nested-loop reference, verify exactness, and the
  * no-cartesian plan shape.
  */
class FuzzyJoinSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("s", StringType)))

  private def names(vals: String*) =
    df(schema, vals.map(Row(_)))

  /** Nested-loop reference: every distinct pair, exact levenshtein. */
  private def reference(vals: Seq[String], d: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      a <- vals.distinct; b <- vals.distinct
      if a < b && lev(a, b) <= d
    } yield (a, b, lev(a, b))).toSet
  }

  private def run(d: Int, vals: String*): Set[(String, String, Int)] =
    Analytics.fuzzySelfJoin(names(vals: _*), "s", d)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet

  test("matches the nested-loop reference exactly at d=1 and d=2") {
    val vals = Seq("kitten", "sitten", "sittin", "sitting", "mitten",
      "bolt", "bolts", "bot", "colt", "jolt", "volt", "hot bolt",
      "hot bolts", "blue ring", "blue rings", "glue ring", "ring",
      "rig", "rug", "unrelated-long-string")
    assert(run(1, vals: _*) == reference(vals, 1))
    assert(run(2, vals: _*) == reference(vals, 2))
  }

  test("substitutions, insertions, deletions, and transposed-as-2 all land") {
    // ed: sub=1, ins=1, del=1, adjacent swap counts 2 under plain
    // levenshtein; swap-plus-insert (abc→bacd) is 3 and must NOT land
    val vals = Seq("abcd", "abed", "abcde", "abc", "bacd")
    val expected = Set(
      ("abc", "abcd", 1), ("abc", "abcde", 2), ("abc", "abed", 2),
      ("abcd", "abcde", 1), ("abcd", "abed", 1), ("abcd", "bacd", 2),
      ("abcde", "abed", 2))
    assert(reference(vals, 2) == expected) // pin the reference itself
    assert(run(2, vals: _*) == expected)
  }

  test("two-sided join keeps sides distinct and verifies exactly") {
    val left = names("hot bolt", "blue ring")
    val right = df(StructType(Seq(StructField("t", StringType))),
      Seq(Row("hot bolts"), Row("red ring"), Row("hot bolt")))
    val out = Analytics.fuzzyJoin(left, "s", right, "t", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(out == Set(
      ("hot bolt", "hot bolts", 1), ("hot bolt", "hot bolt", 0)))
  }

  test("null and over-maxLen values are excluded, not exploded") {
    val out = Analytics.fuzzySelfJoin(
      df(schema, Seq(Row("abc"), Row(null), Row("a" * 100), Row("abd"))),
      "s", 1, maxLen = 64)
    assert(out.collect().map(r => (r.getString(0), r.getString(1)))
      .toSet == Set(("abc", "abd")))
  }

  test("duplicate input rows yield one pair per distinct value pair") {
    val out = run(1, "abc", "abc", "abc", "abd", "abd")
    assert(out == Set(("abc", "abd", 1)))
  }

  test("plan contains no cartesian or nested-loop join") {
    val plan = Analytics.fuzzySelfJoin(names("abc", "abd"), "s", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
