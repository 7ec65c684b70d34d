package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[DamerauLevenshtein]] — the unrestricted (Lowrance–Wagner)
  * variant pinned against DuckDB's values, including the cases where
  * OSA disagrees; SQL registration and null semantics.
  */
class DamerauLevenshteinSpec extends SparkSpec {

  import spark.implicits._

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("pinned DuckDB reference values, including the OSA " +
      "disagreement case") {
    // dl("ca","abc"): unrestricted = 2 (swap then insert THROUGH the
    // edited material); OSA would say 3 — this pins the variant
    assert(dl("ca", "abc") === 2)
    assert(dl("ab", "ba") === 1)
    assert(dl("abc", "acb") === 1)
    assert(dl("martha", "marhta") === 1)
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("abcdef", "abcfad") === 3)
    assert(dl("same", "same") === 0)
  }

  test("a transposition costs 1 where levenshtein charges 2") {
    val df = Seq(("forest green", "forest gren"),
      ("forest green", "forest grene")).toDF("a", "b")
      .select(expr("graft_damerau_levenshtein(a, b)").as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
      .collect()
    assert(df(0).getInt(0) === 1 && df(0).getInt(1) === 1) // deletion
    assert(df(1).getInt(0) === 1 && df(1).getInt(1) === 2) // swap
  }

  test("symmetry, triangle sanity, and nulls") {
    for ((a, b) <- Seq(("abcd", "badc"), ("xy", "yx"), ("pale", "leap")))
      assert(dl(a, b) === dl(b, a))
    val rows = Seq[(String, String)]((null, "x"), ("x", null))
      .toDF("a", "b")
      .select(expr("graft_damerau_levenshtein(a, b)"))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("dl is never above levenshtein on real part names") {
    val part = spark.read
      .parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_name").as("a"))
    val pairs = part.limit(40)
      .crossJoin(part.limit(40).select(col("a").as("b")))
      .select(expr("graft_damerau_levenshtein(a, b)").as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
    assert(pairs.where(col("dl") > col("lev")).count() === 0L)
  }
}
