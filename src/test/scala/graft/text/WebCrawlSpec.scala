package graft.text

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** [[Web.canonicalizeUrl]], [[Multimodal.warcHeaderMeta]],
  * [[Multimodal.pdfShellMeta]] — the crawl-ingestion contracts:
  * canonical-form equivalence classes, real-layout WARC records,
  * from-the-end PDF trailer reads, and the malformed-input gates.
  */
class WebCrawlSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Web.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
      .toSeq

  test("canonicalizeUrl: the classic equivalence class collapses " +
      "to one form") {
    val forms = canon(
      "HTTP://Example.com:80/a?b=2&utm_source=x&a=1#frag",
      "http://example.com/a?a=1&b=2",
      "http://EXAMPLE.com/a?b=2&a=1&fbclid=abc")
    assert(forms.distinct.size == 1, forms.toString)
    assert(forms.head == "http://example.com/a?a=1&b=2")
  }

  test("canonicalizeUrl: https default port, empty path, empty " +
      "query, and bare tracking params") {
    assert(canon("HTTPS://Host.io:443") ==
      Seq("https://host.io/"))
    assert(canon("https://host.io/p?utm_source=x") ==
      Seq("https://host.io/p"))
    assert(canon("https://host.io:8443/p") ==
      Seq("https://host.io:8443/p")) // non-default port survives
    assert(canon("http://h/p?ref") == Seq("http://h/p"))
  }

  test("canonicalizeUrl: malformed URLs quarantine as null") {
    assert(canon("not a url", "ftp//missing.scheme", "") ==
      Seq(null, null, null))
  }

  private def decodeOne(bytes: Array[Byte],
      meta: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    Seq(Tuple1(bytes)).toDF("b").select(meta(col("b")).as("m"))
      .select(col("m.*")).collect()(0)

  test("warcHeaderMeta: a real-layout response record reads every " +
      "field, case-insensitively") {
    val rec = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "warc-target-uri: https://example.com/page\r\n" +
      "WARC-Date: 2024-03-01T12:00:00Z\r\n" +
      "WARC-Record-ID: <urn:uuid:1234>\r\n" +
      "content-length: 2048\r\n" +
      "\r\n" +
      "HTTP/1.1 200 OK\r\n...payload...")
      .getBytes(StandardCharsets.US_ASCII)
    val r = decodeOne(rec, Multimodal.warcHeaderMeta)
    assert(r.getAs[String]("format") == "warc")
    assert(r.getAs[String]("version") == "1.0")
    assert(r.getAs[String]("warc_type") == "response")
    assert(r.getAs[String]("target_uri") ==
      "https://example.com/page")
    assert(r.getAs[Long]("content_length") == 2048L)
    assert(r.getAs[String]("record_id") == "<urn:uuid:1234>")
    // header_len = header block + the blank line
    val want = rec.indexOfSlice("\r\n\r\n".getBytes) + 4
    assert(r.getAs[Long]("header_len") == want.toLong)
  }

  test("warcHeaderMeta: an unterminated header block or wrong magic " +
      "yields all-null") {
    val unterminated = "WARC/1.0\r\nWARC-Type: response\r\n"
      .getBytes(StandardCharsets.US_ASCII)
    val wrong = "HTTP/1.1 200 OK\r\n\r\n"
      .getBytes(StandardCharsets.US_ASCII)
    for (b <- Seq(unterminated, wrong)) {
      val r = decodeOne(b, Multimodal.warcHeaderMeta)
      assert(r.isNullAt(r.fieldIndex("format")))
      assert(r.isNullAt(r.fieldIndex("content_length")))
    }
  }

  test("pdfShellMeta: version from the head, startxref from the " +
      "tail, and the truncation gate") {
    val pdf = ("%PDF-1.7\n" + "x" * 500 +
      "\nstartxref\n421\n%%EOF")
      .getBytes(StandardCharsets.US_ASCII)
    val r = decodeOne(pdf, Multimodal.pdfShellMeta)
    assert(r.getAs[String]("format") == "pdf")
    assert(r.getAs[String]("version") == "1.7")
    assert(r.getAs[Long]("startxref") == 421L)
    assert(r.getAs[Int]("has_eof") == 1)
    // no %%EOF -> has_eof 0, format null (not a well-formed shell)
    val cut = ("%PDF-1.4\n" + "y" * 100)
      .getBytes(StandardCharsets.US_ASCII)
    val rc = decodeOne(cut, Multimodal.pdfShellMeta)
    assert(rc.isNullAt(rc.fieldIndex("format")))
    assert(rc.getAs[Int]("has_eof") == 0)
    val notPdf = ("%!PS-Adobe\n" + "z" * 100)
      .getBytes(StandardCharsets.US_ASCII)
    val rn = decodeOne(notPdf, Multimodal.pdfShellMeta)
    assert(rn.isNullAt(rn.fieldIndex("has_eof")))
  }

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Web.htmlToText(col("h")).as("t"))
      .collect()(0).getString(0)

  test("htmlToText: scripts/styles vanish WITH contents, tags " +
      "become word boundaries, entities decode, whitespace folds") {
    val html = "<html><head><script>var x = '<p>not text</p>';" +
      "</script><style>.c { color: red }</style></head><body>" +
      "<nav><a href='/'>Home</a>|<a>About</a></nav>\n" +
      "<h1>Title</h1>\n<table><tr><td>a</td><td>b</td></tr></table>" +
      "<p>Fish &amp; chips &lt;cheap&gt;&nbsp;daily</p>" +
      "<!-- hidden <b>comment</b> -->" +
      "</body></html>"
    assert(extract(html) ==
      "Home | About Title a b Fish & chips <cheap> daily")
  }

  test("htmlToText: double-escaped entities decode ONE level — " +
      "&amp;lt; is the literal &lt; the author wrote") {
    assert(extract("<p>&amp;lt;tag&amp;gt;</p>") == "&lt;tag&gt;")
  }

  test("registrableDomain: multi-part public suffixes keep three " +
      "labels, generic hosts keep two, IPs pass whole") {
    val hosts = Seq("a.b.example.co.uk", "x.example.com",
      "EXAMPLE.COM", "shop.com.au", "deep.sub.site.ne.jp",
      "localhost", "10.1.2.3", "example.io")
    val got = hosts.toDF("h")
      .select(Web.registrableDomain(col("h")).as("d")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("example.co.uk", "example.com", "example.com",
      "shop.com.au", "site.ne.jp", null, "10.1.2.3", "example.io"))
  }
}
