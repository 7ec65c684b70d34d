package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Multimodal.zipEocdMeta]] — decode of a REAL java.util.zip
  * archive (the q270/q312 treatment: bytes the engine did not
  * synthesize), the data-dependent CD jump, and the guards.
  */
class ZipEocdSpec extends SparkSpec {

  private def metaOf(bytes: Array[Byte]): Row = {
    val frame = df(
      StructType(Seq(StructField("b", BinaryType))),
      Seq(Row(bytes)))
    frame.select(Multimodal.zipEocdMeta(col("b")).as("m"))
      .select("m.*").head()
  }

  test("a real JDK ZipOutputStream archive: entry count, first " +
      "name, method and sizes decode from the EOCD + CD walk") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val payload = "zip inventory test payload zip inventory"
      .getBytes("UTF-8")
    z.putNextEntry(new java.util.zip.ZipEntry("first.txt"))
    z.write(payload); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("second.txt"))
    z.write("x".getBytes("UTF-8")); z.closeEntry()
    z.close()
    val m = metaOf(bos.toByteArray)
    assert(m.getString(0) == "zip")
    assert(m.getLong(1) == 2L)
    assert(m.getString(4) == "first.txt")
    // JDK default is DEFLATED (8); uncompressed size must match
    assert(m.getLong(5) == 8L)
    assert(m.getLong(7) == payload.length.toLong)
    // CRC from the CD must equal the JDK's own CRC of the payload
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    assert(m.getLong(8) == crc.getValue)
  }

  test("a STORED-method real archive reads method 0 and " +
      "csize == usize") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val payload = "stored bytes".getBytes("UTF-8")
    val e = new java.util.zip.ZipEntry("s.bin")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(payload.length)
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    e.setCrc(crc.getValue)
    z.putNextEntry(e); z.write(payload); z.closeEntry(); z.close()
    val m = metaOf(bos.toByteArray)
    assert(m.getLong(5) == 0L)
    assert(m.getLong(6) == m.getLong(7))
  }

  test("truncation and non-zip bytes yield nulls, never a misread") {
    assert(metaOf(Array[Byte](0x50, 0x4B, 0x03)).isNullAt(0))
    assert(metaOf(("not a zip archive at all, but long enough " +
      "to clear the length gate").getBytes("UTF-8")).isNullAt(0))
  }
}
