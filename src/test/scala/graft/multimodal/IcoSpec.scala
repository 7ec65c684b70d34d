package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, unhex}
import org.apache.spark.sql.types._

/** [[Multimodal.icoMeta]] — a hand-rolled 2-image ICONDIR, the
  * 0-means-256 width/height rule, cursor vs icon types, invalid
  * headers, the every-byte-truncation guard, and the maxImages cap.
  */
class IcoSpec extends SparkSpec {

  private def le16(v: Int) = f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x"
  private def le32(v: Long) =
    f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x${(v >> 16) & 0xff}%02x${(v >> 24) & 0xff}%02x"

  private def entry(w: Int, h: Int, bpp: Int, bytes: Long,
      off: Long): String =
    f"$w%02x$h%02x" + "0000" + le16(1) + le16(bpp) + le32(bytes) +
      le32(off)

  /** ICONDIR(type, n) + the given entries. */
  private def ico(typ: Int, entries: String*): String =
    "0000" + le16(typ) + le16(entries.size) + entries.mkString

  private def decode(hexes: String*) = {
    val frame = df(
      StructType(Seq(StructField("hx", StringType))),
      hexes.map(Row(_)))
    frame.select(Multimodal.icoMeta(unhex(col("hx"))).as("m"))
      .select(col("m.format").as("format"),
        col("m.n_images").as("n_images"),
        col("m.images").as("images"))
      .collect()
  }

  private val twoImg = ico(1,
    entry(16, 32, 32, 304L, 38L),
    entry(0, 0, 8, 512L, 342L))

  test("two-image icon: directory + both entries decode, 0 means 256") {
    val r = decode(twoImg)(0)
    assert(r.getAs[String]("format") == "ico")
    assert(r.getAs[Long]("n_images") == 2L)
    val imgs = r.getSeq[Row](2)
    assert(imgs.size == 2)
    val e0 = imgs(0)
    assert(e0.getAs[Int]("img_idx") == 0)
    assert(e0.getAs[Long]("width") == 16L)
    assert(e0.getAs[Long]("height") == 32L)
    assert(e0.getAs[Long]("bpp") == 32L)
    assert(e0.getAs[Long]("bytes_in_res") == 304L)
    assert(e0.getAs[Long]("img_offset") == 38L)
    val e1 = imgs(1)
    assert(e1.getAs[Long]("width") == 256L)
    assert(e1.getAs[Long]("height") == 256L)
    assert(e1.getAs[Long]("bpp") == 8L)
  }

  test("cursor type decodes as 'cur'; bad reserved and bad type are " +
      "rejected whole") {
    val out = decode(
      ico(2, entry(4, 4, 1, 16L, 22L)),
      "0100" + le16(1) + le16(1) + entry(4, 4, 1, 16L, 22L),
      "0000" + le16(3) + le16(1) + entry(4, 4, 1, 16L, 22L),
      "00")
    assert(out(0).getAs[String]("format") == "cur")
    assert(out(0).getAs[Long]("n_images") == 1L)
    (1 to 3).foreach { i =>
      assert(out(i).isNullAt(0), s"case $i format")
      assert(out(i).isNullAt(1), s"case $i count")
      assert(out(i).getSeq[Row](2).isEmpty, s"case $i images")
    }
  }

  test("every-byte truncation: no errors; entries appear only when " +
      "their full 16 bytes are present") {
    val full = twoImg
    val cases = (0 until full.length / 2)
      .map(n => full.substring(0, 2 * n))
    val out = decode(cases: _*)
    out.zipWithIndex.foreach { case (r, n) =>
      val imgs = r.getSeq[Row](2)
      if (n < 6) { assert(r.isNullAt(0) && imgs.isEmpty) }
      else {
        assert(r.getAs[String]("format") == "ico")
        assert(imgs.size == math.min(2, (n - 6) / 16), s"len $n")
      }
    }
  }

  test("maxImages caps the walk even when the directory declares " +
      "more") {
    val six = ico(1, (0 until 6).map(i =>
      entry(i + 1, i + 2, 32, 100L + i, 102L + 16 * i)): _*)
    val r = decode(six)(0)
    assert(r.getAs[Long]("n_images") == 6L)
    val imgs = r.getSeq[Row](2)
    assert(imgs.size == 4)
    assert(imgs.map(_.getAs[Long]("width")).toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }
}
