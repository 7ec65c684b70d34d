package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** [[TextAnalysis.collapseRepeats]] + [[TextAnalysis.dedupLines]] —
  * intra-document repetition cleanup.
  */
class IntraDocCleanupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("text", StringType, nullable = true)))

  private def collapse(rows: Seq[Row], maxRun: Int = 1) =
    TextAnalysis.collapseRepeats(df(schema, rows), "id", "text", maxRun)
      .orderBy("id").collect()

  private def dedup(rows: Seq[Row], sep: String = "\n") =
    TextAnalysis.dedupLines(df(schema, rows), "id", "text", sep)
      .orderBy("id").collect()

  test("collapseRepeats: runs collapse to one, non-adjacent repeats survive") {
    val out = collapse(Seq(
      Row(0, "batch batch batch stream batch window window dup")))
    assert(out(0).getAs[String]("text") ==
      "batch stream batch window dup")
    assert(out(0).getAs[Long]("n_tokens") == 5L)
    assert(out(0).getAs[Long]("n_removed") == 3L)
  }

  test("collapseRepeats: maxRun=2 keeps doubled tokens, trims longer runs") {
    val out = collapse(Seq(
      Row(0, "a a a a b b c")), maxRun = 2)
    assert(out(0).getAs[String]("text") == "a a b b c")
    assert(out(0).getAs[Long]("n_removed") == 2L)
  }

  test("collapseRepeats: normalizes case/punctuation via words(), handles empty and null") {
    val out = collapse(Seq(
      Row(0, "Stop, stop! STOP."), Row(1, ""), Row(2, null)))
    assert(out(0).getAs[String]("text") == "stop")
    assert(out(0).getAs[Long]("n_removed") == 2L)
    for (i <- Seq(1, 2)) {
      assert(out(i).getAs[String]("text") == "")
      assert(out(i).getAs[Long]("n_tokens") == 0L)
      assert(out(i).getAs[Long]("n_removed") == 0L)
    }
  }

  test("dedupLines: keep-first preserves order; later duplicates drop") {
    val out = dedup(Seq(
      Row(0, "home\nabout\nhome\ncontact\nabout\nhome")))
    assert(out(0).getAs[String]("text") == "home\nabout\ncontact")
    assert(out(0).getAs[Long]("n_lines") == 3L)
    assert(out(0).getAs[Long]("n_removed") == 3L)
  }

  test("dedupLines: all-unique doc passes through byte-identical") {
    val text = "alpha beta\ngamma\ndelta epsilon"
    val out = dedup(Seq(Row(0, text)))
    assert(out(0).getAs[String]("text") == text)
    assert(out(0).getAs[Long]("n_removed") == 0L)
  }

  test("dedupLines: custom separator and single-line doc") {
    val out = dedup(Seq(Row(0, "x|y|x|z")), sep = "|")
    assert(out(0).getAs[String]("text") == "x|y|z")
    val single = dedup(Seq(Row(0, "just one line")))
    assert(single(0).getAs[String]("text") == "just one line")
    assert(single(0).getAs[Long]("n_lines") == 1L)
  }

  test("dedupLines: duplicate EMPTY lines collapse too (blank-run normalization)") {
    val out = dedup(Seq(Row(0, "a\n\n\nb\n\na")))
    // lines: [a, "", "", b, "", a] -> [a, "", b]
    assert(out(0).getAs[String]("text") == "a\n\nb")
    assert(out(0).getAs[Long]("n_removed") == 3L)
  }

  private def dedupGlobal(rows: Seq[Row], sep: String = "\n") =
    TextAnalysis.dedupLinesGlobal(df(schema, rows), "id", "text", sep)
      .orderBy("id").collect()

  test("dedupLinesGlobal: lowest (id, pos) keeps the line; later docs lose it") {
    val out = dedupGlobal(Seq(
      Row(0, "nav bar\nunique zero"),
      Row(1, "unique one\nnav bar"),
      Row(2, "nav bar\nnav bar")))
    assert(out(0).getAs[String]("text") == "nav bar\nunique zero")
    assert(out(0).getAs[Long]("n_removed") == 0L)
    assert(out(1).getAs[String]("text") == "unique one")
    assert(out(1).getAs[Long]("n_removed") == 1L)
    // doc 2's lines BOTH first appeared at doc 0 pos 0
    assert(out(2).getAs[String]("text") == "")
    assert(out(2).getAs[Long]("n_lines") == 0L)
    assert(out(2).getAs[Long]("n_removed") == 2L)
  }

  test("dedupLinesGlobal: subsumes within-doc dedup and preserves line order") {
    val out = dedupGlobal(Seq(Row(0, "b\na\nb\nc\na")))
    assert(out(0).getAs[String]("text") == "b\na\nc")
    assert(out(0).getAs[Long]("n_lines") == 3L)
    assert(out(0).getAs[Long]("n_removed") == 2L)
  }

  test("dedupLinesGlobal: single-doc corpus equals dedupLines") {
    val rows = Seq(Row(0, "x\ny\nx\nz\ny"))
    val g = dedupGlobal(rows)(0)
    val l = dedup(rows)(0)
    assert(g.getAs[String]("text") == l.getAs[String]("text"))
    assert(g.getAs[Long]("n_lines") == l.getAs[Long]("n_lines"))
    assert(g.getAs[Long]("n_removed") == l.getAs[Long]("n_removed"))
  }

  test("dedupLinesGlobal: within-position tie across docs goes to the lower id") {
    val out = dedupGlobal(Seq(
      Row(5, "shared"), Row(3, "shared"), Row(9, "shared")))
    assert(out.map(r =>
        r.getAs[Int]("id") -> r.getAs[Long]("n_lines")).toMap ==
      Map(3 -> 1L, 5 -> 0L, 9 -> 0L))
  }
}
