package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Multimodal.gzipMeta]] — decode of a REAL gzip member produced
  * by the JDK's GZIPOutputStream (the q270 treatment: prove the walk
  * on bytes we didn't synthesize), the FLG-bit variable-position
  * walk, trailer ISIZE correctness, and the truncation guard.
  */
class GzipMetaSpec extends SparkSpec {

  private def metaOf(bytes: Array[Byte]): Row = {
    val frame = df(
      StructType(Seq(StructField("b", BinaryType))),
      Seq(Row(bytes)))
    frame.select(Multimodal.gzipMeta(col("b")).as("m"))
      .select("m.*").head()
  }

  test("a real JDK GZIPOutputStream member: format/ISIZE/header " +
      "decode from bytes the engine did not synthesize") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    val payload = "graft gzip metadata test payload".getBytes("UTF-8")
    gz.write(payload); gz.close()
    val m = metaOf(bos.toByteArray)
    assert(m.getString(0) == "gzip")
    // JDK writes FLG = 0: no extra, no name, header is exactly 10
    assert(m.getInt(4) == 0 && m.isNullAt(6))
    assert(m.getLong(7) == 10L)
    // trailer ISIZE = uncompressed length
    assert(m.getLong(8) == payload.length.toLong)
    // CRC32 trailer matches the JDK's own CRC of the payload
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    assert(m.getLong(9) == crc.getValue)
  }

  test("FNAME walk: a hand-built header with EXTRA + NAME puts the " +
      "name after the xlen-shifted offset") {
    // magic, CM, FLG=0x0C (FEXTRA|FNAME), MTIME=1, XFL=2, OS=3,
    // XLEN=3 + 3 bytes, name "ab\0", body "Z", CRC=0, ISIZE=1
    val hex = "1F8B08" + "0C" + "01000000" + "02" + "03" +
      "0300" + "414141" + "6162" + "00" + "5A" +
      "00000000" + "01000000"
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte)
      .toArray
    val m = metaOf(bytes)
    assert(m.getString(0) == "gzip")
    assert(m.getLong(1) == 1L && m.getLong(2) == 3L &&
      m.getLong(3) == 2L)
    assert(m.getInt(4) == 1 && m.getLong(5) == 3L)
    assert(m.getString(6) == "ab")
    // header = 10 fixed + 2 xlen field + 3 extra + 2 name + 1 NUL
    assert(m.getLong(7) == 18L)
    assert(m.getLong(8) == 1L)
  }

  test("truncation guard: a payload cut before the trailer yields " +
      "all nulls, never a misread") {
    val m = metaOf(Array[Byte](0x1F, 0x8B.toByte, 0x08, 0x00))
    assert(m.isNullAt(0) && m.isNullAt(1) && m.isNullAt(8))
  }

  test("non-gzip bytes yield nulls") {
    val m = metaOf("definitely not gzip but long enough to pass 18"
      .getBytes("UTF-8"))
    assert(m.isNullAt(0))
  }
}
