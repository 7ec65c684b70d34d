package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Multimodal.tiffHeaderMeta]] — hand-built IFDs in both byte
  * orders, the truncation/unknown-type guards, the orientation
  * default, and real JDK-ImageIO TIFF bytes (the q270 real-encoder
  * treatment).
  */
class TiffHeaderSpec extends SparkSpec {

  private def binDf(bytes: Array[Byte]) = df(
    StructType(Seq(StructField("b", BinaryType))),
    Seq(Row(bytes)))

  private def meta(bytes: Array[Byte]): Row =
    binDf(bytes).select(Multimodal.tiffHeaderMeta(col("b")).as("m"))
      .select("m.*").head()

  /** Minimal hand-built TIFF: header, optional pad, one IFD. */
  private def tiff(le: Boolean, pad: Int,
      entries: Seq[(Int, Int, Long)]): Array[Byte] = {
    def n(v: Long, bytes: Int): Seq[Byte] = {
      val be = (bytes - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte)
      if (le) be.reverse else be
    }
    val ifdOff = 8 + pad
    val head = (if (le) Seq[Byte](0x49, 0x49) else Seq[Byte](0x4D, 0x4D)) ++
      n(42L, 2) ++ n(ifdOff.toLong, 4) ++ Seq.fill(pad)(0.toByte)
    val dir = n(entries.length.toLong, 2) ++ entries.flatMap {
      case (tag, typ, v) =>
        val value = typ match {
          case 3 => n(v, 2) ++ Seq[Byte](0, 0)
          case 4 => n(v, 4)
          case _ => Seq[Byte](0, 0, 0, 0) // offset we never follow
        }
        n(tag.toLong, 2) ++ n(typ.toLong, 2) ++ n(1L, 4) ++ value
    } ++ Seq.fill(4)(0.toByte)
    (head ++ dir).toArray
  }

  test("both byte orders decode identically: II and MM payloads " +
      "with padded IFDs read the same width/height/orientation") {
    for (le <- Seq(true, false)) {
      val out = meta(tiff(le, pad = 5, Seq(
        (0x00FE, 4, 0L), (0x0100, 3, 640L), (0x0101, 4, 480L),
        (0x0102, 3, 8L), (0x0112, 3, 6L))))
      assert(out.getString(0) == "tiff")
      assert(out.getString(1) == (if (le) "II" else "MM"))
      assert(out.getInt(2) == 5)
      assert(out.getLong(3) == 640L && out.getLong(4) == 480L)
      assert(out.getInt(5) == 6 && out.getInt(6) == 8)
    }
  }

  test("orientation defaults to 1 when the tag is absent; an " +
      "unsupported value type (RATIONAL) is ignored, not misread") {
    val out = meta(tiff(le = true, pad = 0, Seq(
      (0x0100, 5, 640L), // RATIONAL width: must stay null
      (0x0101, 3, 480L))))
    assert(out.isNullAt(3) && out.getLong(4) == 480L)
    assert(out.getInt(5) == 1)
  }

  test("truncation guards: a payload cut mid-header nulls " +
      "everything; cut mid-entry keeps the header fields and nulls " +
      "the unreadable values") {
    val full = tiff(le = false, pad = 0, Seq((0x0100, 3, 99L)))
    val midHeader = meta(full.take(6))
    assert(midHeader.isNullAt(0) && midHeader.isNullAt(3))
    val midEntry = meta(full.take(12)) // count readable, entry not
    assert(midEntry.getString(0) == "tiff" && midEntry.isNullAt(3))
  }

  test("not-TIFF magic (II but 43) yields nulls") {
    val bad = tiff(le = true, pad = 0, Seq((0x0100, 3, 9L)))
    bad(2) = 43.toByte
    assert(meta(bad).isNullAt(0))
  }

  test("real JDK-ImageIO TIFF bytes decode to the encoded " +
      "dimensions — the walk works on an actual encoder's layout, " +
      "not just our synthetic fixtures") {
    val im = new java.awt.image.BufferedImage(
      31, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(im, "tiff", bos)
    assume(ok, "JDK TIFF writer unavailable")
    val out = meta(bos.toByteArray)
    assert(out.getString(0) == "tiff")
    assert(out.getLong(3) == 31L && out.getLong(4) == 17L)
  }
}
