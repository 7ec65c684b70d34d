package graft.multimodal

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Multimodal.avifHeaderMeta]] — the ftyp→meta→iprp→ipco→ispe
  * chain proven against byte arrays written by an INDEPENDENT
  * JVM-side box assembler (a different code path from the registry's
  * SQL hex builder), the sibling-skip walks, and the truncation
  * gates at every boundary.
  */
class AvifSpec extends SparkSpec {

  import spark.implicits._

  private def decodeOne(bytes: Array[Byte]) =
    Seq(Tuple1(bytes)).toDF("b")
      .select(Multimodal.avifHeaderMeta(col("b")).as("m"))
      .select(col("m.*")).collect()(0)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val size = 8 + payload.length
    Array[Byte](
      ((size >> 24) & 0xFF).toByte, ((size >> 16) & 0xFF).toByte,
      ((size >> 8) & 0xFF).toByte, (size & 0xFF).toByte) ++
      typ.getBytes(StandardCharsets.US_ASCII) ++ payload
  }

  private def be4(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def ispe(w: Long, h: Long): Array[Byte] =
    box("ispe", be4(0L) ++ be4(w) ++ be4(h))

  /** A realistic file: ftyp(brand) + meta[hdlr, pitm, iprp[ipco[
    * pre-properties…, ispe, post]]].
    */
  private def avifBytes(brand: String, w: Long, h: Long,
      preProps: Seq[Array[Byte]] = Seq.empty,
      postProps: Seq[Array[Byte]] = Seq.empty): Array[Byte] = {
    val ftyp = box("ftyp",
      brand.getBytes(StandardCharsets.US_ASCII) ++ be4(0L))
    val hdlr = box("hdlr", be4(0L) ++ be4(0L) ++
      "pict".getBytes(StandardCharsets.US_ASCII) ++
      new Array[Byte](12) :+ 0.toByte)
    val pitm = box("pitm", be4(0L) ++ Array[Byte](0, 1))
    val props = (preProps :+ ispe(w, h)) ++ postProps
    val ipco = box("ipco", props.foldLeft(Array.empty[Byte])(_ ++ _))
    val iprp = box("iprp", ipco)
    val meta = box("meta", be4(0L) ++ hdlr ++ pitm ++ iprp)
    ftyp ++ meta
  }

  private val pixi = box("pixi",
    be4(0L) ++ Array[Byte](3, 8, 8, 8))
  private val colr = box("colr",
    "nclx".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](0, 1, 0, 13, 0, 6, 0x80.toByte))

  test("real layout round-trips: hdlr and pitm skipped in meta, " +
      "pixi and colr skipped in ipco, ispe read wherever it sits") {
    val r = decodeOne(avifBytes("avif", 1920L, 1080L,
      preProps = Seq(colr, pixi)))
    assert(r.getAs[String]("format") == "avif")
    assert(r.getAs[String]("brand") == "avif")
    assert(r.getAs[Long]("width") == 1920L)
    assert(r.getAs[Long]("height") == 1080L)
  }

  test("heic and mif1 brands read as heif; isom is not this family") {
    assert(decodeOne(avifBytes("heic", 10L, 20L))
      .getAs[String]("format") == "heif")
    assert(decodeOne(avifBytes("mif1", 10L, 20L))
      .getAs[String]("format") == "heif")
    val r = decodeOne(avifBytes("isom", 10L, 20L))
    assert(r.isNullAt(r.fieldIndex("format")))
    assert(r.isNullAt(r.fieldIndex("brand")))
    assert(r.isNullAt(r.fieldIndex("width")))
  }

  test("ispe first in ipco works too (no pre-properties)") {
    val r = decodeOne(avifBytes("avif", 7L, 9L,
      postProps = Seq(pixi)))
    assert(r.getAs[Long]("width") == 7L)
    assert(r.getAs[Long]("height") == 9L)
  }

  test("truncation at EVERY byte boundary yields nulls for what is " +
      "cut, never a misread") {
    val full = avifBytes("avif", 640L, 480L, preProps = Seq(pixi))
    (0 until full.length).foreach { n =>
      val r = decodeOne(full.take(n))
      if (n < full.length - 4) // height's last byte is the last byte
        assert(r.isNullAt(r.fieldIndex("height")), s"cut at $n")
      if (n < 16)
        assert(r.isNullAt(r.fieldIndex("format")), s"cut at $n")
    }
    // cut right after width: identity intact, both dims gated
    val cut = full.dropRight(4)
    val r = decodeOne(cut)
    assert(r.getAs[String]("format") == "avif")
    assert(r.isNullAt(r.fieldIndex("width")))
    assert(r.isNullAt(r.fieldIndex("height")))
  }

  test("a size-0 box inside meta bails to null instead of walking " +
      "in place") {
    val ftyp = box("ftyp",
      "avif".getBytes(StandardCharsets.US_ASCII) ++ be4(0L))
    val bad = Array[Byte](0, 0, 0, 0) ++
      "free".getBytes(StandardCharsets.US_ASCII)
    val iprp = box("iprp", box("ipco", ispe(3L, 4L)))
    val meta = box("meta", be4(0L) ++ bad ++ iprp)
    val r = decodeOne(ftyp ++ meta)
    assert(r.getAs[String]("format") == "avif")
    assert(r.isNullAt(r.fieldIndex("width")))
  }

  test("more siblings than the walk bound: ispe beyond 8 ipco " +
      "children is reported null (bounded walk, not a misread)") {
    val many = (1 to 8).map(_ => pixi)
    val r = decodeOne(avifBytes("avif", 5L, 6L, preProps = many))
    assert(r.getAs[String]("format") == "avif")
    assert(r.isNullAt(r.fieldIndex("width")))
  }
}
