package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Compression-ratio text signal: deflate(text).length / text.length.
  * Low-entropy documents (boilerplate, keyword stuffing, repeated
  * templates) compress far below natural prose — the classic cheap
  * quality filter a training-data pipeline runs alongside
  * [[TextAnalysis.qualityScore]].
  *
  * Runs as partition-parallel batched iteration (same shape as the
  * multimodal decoders): one `Deflater` per batch, reused across rows
  * — the JVM-side analogue of an Arrow-batched UDF, no Python
  * boundary. Zero shuffles; scales linearly with executors.
  */
object Compressibility {

  /** Deflated byte size of a payload (zlib default level; the
    * deflater is caller-supplied so batches reuse one native buffer).
    */
  private def deflatedSize(
      d: java.util.zip.Deflater, bytes: Array[Byte]): Int = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](math.max(64, bytes.length + 64))
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** (id, raw_len, deflate_len, ratio) per document; null ratio for
    * null/empty text (no 0/0).
    */
  def deflateRatio(
      df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 256): DataFrame = {
    val session = df.sparkSession
    val idType = df.schema(idCol).dataType
    val outSchema = StructType(Seq(
      StructField("id", idType),
      StructField("raw_len", IntegerType),
      StructField("deflate_len", IntegerType),
      StructField("ratio", DoubleType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val textIdx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater()
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val text = r.get(textIdx) match {
            case s: String => s
            case _ => null
          }
          if (text == null || text.isEmpty)
            Row(r.get(idIdx), if (text == null) null else 0, null, null)
          else {
            val raw = text.getBytes("UTF-8")
            val comp = deflatedSize(deflater, raw)
            Row(r.get(idIdx), raw.length, comp,
              comp.toDouble / raw.length)
          }
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }
}
