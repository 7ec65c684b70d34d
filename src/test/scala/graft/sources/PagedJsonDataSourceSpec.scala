package graft.sources

import graft.SparkSpec
import graft.extract.ClientsSpec
import graft.extract.UsgsSource
import org.apache.spark.sql.functions._

class PagedJsonDataSourceSpec extends SparkSpec {

  private def writePage(name: String, body: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pages")
    val p = dir.resolve(name)
    java.nio.file.Files.writeString(p, body)
    p.toUri.toString
  }

  test("plans one partition per page and fetches inside partitions") {
    val u1 = writePage("p1.json", """{"a":1}""")
    val u2 = writePage("p2.json", """{"a":2}""")
    val df = spark.read.format("graft.sources.PagedJsonDataSource")
      .option("urls", s"$u1\n$u2").load()
    assert(df.columns.toSeq == Seq("page_url", "body"))
    assert(df.rdd.getNumPartitions == 2) // one partition per page
    val rows = df.orderBy("page_url").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSet ==
      Set("""{"a":1}""", """{"a":2}"""))
  }

  test("composes with the existing page parsers downstream") {
    val url = writePage("geo.json", ClientsSpec.mockGeojson)
    val parsed = spark.read.format("graft.sources.PagedJsonDataSource")
      .option("urls", url).load()
      .select(from_json(col("body"), UsgsSource.pageSchema).as("g"))
      .select(explode(col("g.features")).as("f"))
      .select(col("f.id"), col("f.properties.mag").as("magnitude"))
    val rows = parsed.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "us7000l1aa")
    assert(rows(0).getDouble(1) == 6.2)
  }

  test("failed fetch surfaces as a task error, not silent empty") {
    val df = spark.read.format("graft.sources.PagedJsonDataSource")
      .option("urls", "file:///nonexistent/nope.json").load()
    intercept[org.apache.spark.SparkException] {
      df.collect()
    }
  }
}
