package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {

  private val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A)
  private val jpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  private val riffMagic = "RIFF1234WAVE".getBytes("ASCII")

  private def binDf(rows: (Int, Array[Byte])*) = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("content", BinaryType))),
    rows.map { case (i, b) => Row(i, b) })

  test("sniffMime detects png/jpeg/wav and falls back to octet-stream") {
    val d = binDf(
      (1, pngMagic), (2, jpegMagic), (3, riffMagic),
      (4, "plain text".getBytes))
    val out = d.select(col("id"), Multimodal.sniffMime(col("content")).as("m"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq == Seq(
      "image/png", "image/jpeg", "audio/wav", "application/octet-stream"))
  }

  test("withBinaryMeta adds mime, byte_len, md5 fingerprint") {
    val payload = "hello".getBytes
    val out = Multimodal.withBinaryMeta(binDf((1, payload)), "content").head()
    assert(out.getAs[Long]("byte_len") == 5L)
    assert(out.getAs[String]("fingerprint") ==
      "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(out.getAs[String]("mime") == "application/octet-stream")
  }

  test("chunkBinary splits payloads into fixed-size chunks") {
    val payload = (0 until 10).map(_.toByte).toArray
    val out = Multimodal.chunkBinary(binDf((1, payload)), "id", "content", 4)
      .orderBy("chunk_idx").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Array[Byte]]("chunk").toSeq == payload.slice(0, 4).toSeq)
    assert(out(2).getAs[Array[Byte]]("chunk").length == 2) // tail chunk
  }

  test("chunkBinary of an empty payload yields zero chunks") {
    val out = Multimodal.chunkBinary(
      binDf((1, Array.empty[Byte])), "id", "content", 4)
    assert(out.count() == 0)
  }

  test("chunkCount matches ceil division") {
    val d = binDf((1, new Array[Byte](300)))
    assert(d.select(Multimodal.chunkCount(col("content"), 256))
      .head().getInt(0) == 2)
  }

  test("stubDecodeFeatures emits fixed-width deterministic features") {
    val d = binDf((1, "abc".getBytes), (2, "xyz".getBytes))
    val out = Multimodal.stubDecodeFeatures(d, "id", "content", dim = 8)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 2)
    val f1 = rows(0).getSeq[Float](1)
    assert(f1.length == 8)
    assert(f1.forall(v => v >= 0f && v <= 1f))
    // deterministic: same input → same features
    val again = Multimodal.stubDecodeFeatures(d, "id", "content", dim = 8)
      .orderBy("id").collect()(0).getSeq[Float](1)
    assert(f1 == again)
    // different payloads → different features
    assert(f1 != rows(1).getSeq[Float](1))
  }

  test("stubDecodeFeatures batches partitions without dropping rows") {
    val many = (1 to 100).map(i => (i, s"payload-$i".getBytes))
    val out = Multimodal.stubDecodeFeatures(
      binDf(many: _*), "id", "content", dim = 4, batchSize = 16)
    assert(out.count() == 100)
  }
}
