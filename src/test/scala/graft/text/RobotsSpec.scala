package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Web.robotsDirectives]] — REP group semantics on hand-written
  * policy files: the consecutive user-agent run rule, comment
  * stripping, case-insensitive fields, junk-line tolerance, global
  * sitemaps, and colon-bearing values.
  */
class RobotsSpec extends SparkSpec {

  import spark.implicits._

  private def parse(txt: String): Seq[(Option[Int], String, String)] =
    Seq(Tuple1(txt)).toDF("t")
      .select(explode(Web.robotsDirectives(col("t"))).as("e"))
      .select("e.grp", "e.field", "e.value").collect().toSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        r.getString(1), r.getString(2)))

  test("two consecutive User-agent lines open ONE group; a rule " +
      "line closes the run so a later User-agent starts group 2") {
    val out = parse(
      "User-agent: a\nUser-agent: b\nDisallow: /x\n" +
        "User-agent: c\nAllow: /y")
    assert(out === Seq(
      (Some(1), "user-agent", "a"), (Some(1), "user-agent", "b"),
      (Some(1), "disallow", "/x"),
      (Some(2), "user-agent", "c"), (Some(2), "allow", "/y")))
  }

  test("comments strip (full-line and inline), fields match " +
      "case-insensitively, junk lines are ignored") {
    val out = parse(
      "# header\nUSER-AGENT: *\nDisAllow: /a # inline\n" +
        "not a directive\nCRAWL-delay: 5")
    assert(out === Seq(
      (Some(1), "user-agent", "*"), (Some(1), "disallow", "/a"),
      (Some(1), "crawl-delay", "5")))
  }

  test("sitemap is global (grp null) and keeps its colon-bearing " +
      "URL; it does not close a user-agent run") {
    val out = parse(
      "Sitemap: https://e.com/s.xml\nUser-agent: a\n" +
        "User-agent: b\nDisallow: /")
    assert(out === Seq(
      (None, "sitemap", "https://e.com/s.xml"),
      (Some(1), "user-agent", "a"), (Some(1), "user-agent", "b"),
      (Some(1), "disallow", "/")))
  }

  test("orphan rules before any group attach to grp 0 — visible, " +
      "never silently dropped") {
    val out = parse("Disallow: /early\nUser-agent: *\nAllow: /")
    assert(out === Seq(
      (Some(0), "disallow", "/early"),
      (Some(1), "user-agent", "*"), (Some(1), "allow", "/")))
  }

  test("blank lines are not group separators (RFC 9309): rules " +
      "after a blank still attach to the open group") {
    val out = parse("User-agent: *\n\nDisallow: /a\n\n\nAllow: /b")
    assert(out === Seq(
      (Some(1), "user-agent", "*"), (Some(1), "disallow", "/a"),
      (Some(1), "allow", "/b")))
  }

  test("empty value (allow-all disallow) survives as empty string") {
    val out = parse("User-agent: *\nDisallow:")
    assert(out === Seq(
      (Some(1), "user-agent", "*"), (Some(1), "disallow", "")))
  }
}
