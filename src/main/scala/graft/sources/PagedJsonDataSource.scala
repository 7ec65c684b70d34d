package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 batch source that fetches JSON pages INSIDE executor
  * partitions — the distributed-ingest shape for the engine's paged
  * REST sources (SURVEY.md §3 E1: "for large sources, a DataSource V2
  * that fetches pages inside partitions moves the network calls to
  * executors").
  *
  * The driver plans ONE InputPartition per page URL (the page list is
  * known up front for offset/page-number pagination once the first
  * page's metadata is read); executors fetch and emit `(page_url,
  * body)` rows in parallel. Downstream, the existing pure parsers
  * (`UsgsSource.pageSchema` + `from_json`/`explode`) turn page bodies
  * into typed rows — the same parse plan as driver-side ingest, so the
  * two paths share all semantics.
  *
  * The `urls` option is NEWLINE-separated (URLs may contain commas):
  * ```scala
  * spark.read.format("graft.sources.PagedJsonDataSource")
  *   .option("urls", "https://host/q?page=1\nhttps://host/q?page=2")
  *   .load()
  *   .select(from_json($"body", UsgsSource.pageSchema).as("g"))
  *   ...
  * ```
  *
  * Supported URL schemes: `http(s)` (via the engine's transport, 30 s
  * timeout) and `file:` (tests / local replay of captured pages).
  * Rate limiting at executor scale is per-task: budget
  * `rate_limit / expected-parallel-tasks` per partition, or front the
  * API with a quota proxy — a global token bucket cannot span
  * executors (documented limitation, not a silent one).
  */
class PagedJsonDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // newline-separated: URLs legally contain commas (e.g. Open-Meteo
    // daily=a,b,c) but never raw newlines
    val urls = Option(properties.get("urls"))
      .map(_.split("\n").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new PagedJsonTable(urls)
  }
}

object PagedJsonDataSource {
  val schema: StructType = StructType(Seq(
    StructField("page_url", StringType, nullable = false),
    StructField("body", StringType, nullable = true)))

  /** Fetch one URL's body (executor-side). */
  private[sources] def fetch(url: String): String =
    if (url.startsWith("file:")) {
      val path = java.nio.file.Paths.get(java.net.URI.create(url))
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    } else {
      val resp = new graft.extract.JdkHttpTransport("graft-engine/dsv2")
        .get(url, Map.empty)
      if (resp.status >= 400)
        throw new java.io.IOException(s"HTTP ${resp.status} for $url")
      resp.body
    }
}

private[sources] class PagedJsonTable(urls: Seq[String])
  extends Table with SupportsRead {

  override def name(): String = s"paged_json(${urls.size} pages)"
  override def schema(): StructType = PagedJsonDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedJsonDataSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        urls.map(PageInputPartition(_): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new PageReaderFactory
    }
}

private[sources] case class PageInputPartition(url: String)
  extends InputPartition

private[sources] class PageReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val url = partition.asInstanceOf[PageInputPartition].url
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed
      override def get(): InternalRow = {
        consumed = true
        val body = PagedJsonDataSource.fetch(url)
        InternalRow(
          UTF8String.fromString(url),
          UTF8String.fromString(body))
      }
      override def close(): Unit = ()
    }
  }
}
