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

  test("imageHeaderMeta decodes PNG IHDR width/height/depth/channels " +
      "from real codec output") {
    val png = Multimodal.syntheticPng(37, 21, seed = 1)
    val out = binDf((1, png))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[String]("format") == "png")
    assert(out.getAs[Long]("width") == 37L)
    assert(out.getAs[Long]("height") == 21L)
    assert(out.getAs[Int]("bit_depth") == 8)
    assert(out.getAs[Int]("channels") == 3) // TYPE_INT_RGB → color type 2
  }

  test("imageHeaderMeta decodes GIF logical-screen dims (LE uint16)") {
    // GIF89a, 300x7 screen
    val gif = "GIF89a".getBytes("ASCII") ++
      Array[Byte](0x2C, 0x01, 7, 0) // 0x012C = 300 LE; 0x0007
    val out = binDf((1, gif))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[String]("format") == "gif")
    assert(out.getAs[Long]("width") == 300L)
    assert(out.getAs[Long]("height") == 7L)
  }

  test("imageHeaderMeta nulls the numeric fields for payloads truncated " +
      "mid-header instead of misreading the bytes that remain") {
    val truncatedPng = Multimodal.syntheticPng(37, 21, seed = 1).take(20)
    val truncatedGif = "GIF89a".getBytes("ASCII") ++ Array[Byte](0x2C)
    val out = binDf((1, truncatedPng), (2, truncatedGif))
      .select(col("id"), Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("id", "m.*").orderBy("id").collect()
    assert(out(0).getAs[String]("format") == "png")
    assert(out(0).isNullAt(out(0).fieldIndex("width")))
    assert(out(0).isNullAt(out(0).fieldIndex("height")))
    assert(out(1).getAs[String]("format") == "gif")
    assert(out(1).isNullAt(out(1).fieldIndex("width")))
  }

  test("imageHeaderMeta sign-extends the BMP int32 height (top-down " +
      "BMPs store it negative)") {
    // BITMAPINFOHEADER: 14-byte file header + 40-byte info header;
    // biWidth=64, biHeight=-32 (top-down), biBitCount=24
    val bb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0)
      .putInt(54).putInt(40).putInt(64).putInt(-32)
      .putShort(1).putShort(24)
    val out = binDf((1, bb.array()))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[String]("format") == "bmp")
    assert(out.getAs[Long]("width") == 64L)
    assert(out.getAs[Long]("height") == 32L)
    assert(out.getAs[Int]("bit_depth") == 24)
  }

  test("wavHeaderMeta nulls fields for a RIFF/WAVE payload truncated " +
      "before the canonical 44-byte header ends") {
    val bb = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(24)
      .put("WAVEfmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(176400)
    val out = binDf((1, bb.array()))
      .select(Multimodal.wavHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.isNullAt(out.fieldIndex("channels")))
    assert(out.isNullAt(out.fieldIndex("sample_rate")))
  }

  test("synthesizeTestImages handles negative ids (string-id hashCode " +
      "fallback) without crashing the partition") {
    val d = df(
      StructType(Seq(StructField("id", LongType))),
      Seq(Row(-17L), Row(3L), Row(Long.MinValue)))
    val out = Multimodal.synthesizeTestImages(d, "id")
    assert(out.count() == 3)
    val decoded = Multimodal.decodeImageFeatures(out, "id", "png")
    assert(decoded.where(col("width").isNull).count() == 0)
  }

  test("decodeWavStats roundtrips squareWav exactly: rms and peak both " +
      "equal the amplitude, header fields agree with wavHeaderMeta") {
    val d = df(
      StructType(Seq(StructField("id", LongType))),
      Seq(Row(0L), Row(7L), Row(13L)))
    val wavs = Multimodal.synthesizeTestWavs(d, "id")
    val stats = Multimodal.decodeWavStats(wavs, "id", "wav")
      .orderBy("id").collect()
    for (r <- stats) {
      val id = r.getLong(0)
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Long]("sample_rate") == 8000 + (id % 3) * 4000)
      assert(r.getAs[Long]("n_samples") == 400 + (id % 5) * 200)
      val amp = 1000 + (id % 20) * 1500
      assert(r.getAs[Int]("peak") == amp)
      assert(r.getAs[Double]("rms") == amp.toDouble) // exact, not approx
    }
    val header = wavs
      .select(col("id"), Multimodal.wavHeaderMeta(col("wav")).as("m"))
      .select("id", "m.*").orderBy("id").collect()
    for ((h, s) <- header.zip(stats)) {
      assert(h.getAs[Int]("channels") == 1)
      assert(h.getAs[Long]("sample_rate") == s.getAs[Long]("sample_rate"))
      assert(h.getAs[Long]("data_bytes") == 2 * s.getAs[Long]("n_samples"))
    }
  }

  test("decodeWavStats yields nulls for corrupt, truncated, or non-PCM16 " +
      "payloads without failing the scan") {
    val good = Multimodal.squareWav(8000, 100, 5000)
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType), StructField("wav", BinaryType))),
      Seq(
        Row(1, "not audio at all".getBytes: Array[Byte]),
        Row(2, good.take(30)),
        Row(3, good)))
    val out = Multimodal.decodeWavStats(d, "id", "wav").orderBy("id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("rms")))
    assert(out(1).isNullAt(out(1).fieldIndex("rms")))
    assert(out(2).getAs[Double]("rms") == 5000.0)
  }

  // --- JPEG SOF walk ------------------------------------------------ //

  /** Assemble a JPEG byte stream from (marker, payload) segments —
    * length field (payload + 2) computed here, SOI/EOI not included.
    */
  private def jpegBytes(segments: (Int, Array[Byte])*): Array[Byte] = {
    val body = segments.flatMap { case (m, p) =>
      Array(0xFF.toByte, m.toByte,
        ((p.length + 2) >> 8).toByte, ((p.length + 2) & 0xFF).toByte) ++ p
    }
    Array(0xFF.toByte, 0xD8.toByte) ++ body
  }

  private def sofPayload(w: Int, h: Int, prec: Int, ncomp: Int) =
    Array(prec.toByte, (h >> 8).toByte, (h & 0xFF).toByte,
      (w >> 8).toByte, (w & 0xFF).toByte, ncomp.toByte)

  private val jfifApp0 = // standard 16-byte APP0 payload ("JFIF\0"...)
    "JFIF".getBytes("ASCII") ++ Array.fill[Byte](10)(0)

  test("imageHeaderMeta walks JPEG segments to SOF0: dims, precision, " +
      "channels — through a variable-length comment segment") {
    val jpg = jpegBytes(
      (0xE0, jfifApp0),
      (0xFE, "a comment of odd length!".getBytes("ASCII")), // COM
      (0xDB, Array.fill[Byte](65)(1)), // DQT
      (0xC0, sofPayload(w = 637, h = 421, prec = 8, ncomp = 3)))
    val out = binDf((1, jpg))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[String]("format") == "jpeg")
    assert(out.getAs[Long]("width") == 637L)
    assert(out.getAs[Long]("height") == 421L)
    assert(out.getAs[Int]("bit_depth") == 8)
    assert(out.getAs[Int]("channels") == 3)
  }

  test("progressive SOF2 and 12-bit grayscale decode the same way") {
    val jpg = jpegBytes(
      (0xE0, jfifApp0),
      (0xC2, sofPayload(w = 99, h = 1024, prec = 12, ncomp = 1)))
    val out = binDf((1, jpg))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[String]("format") == "jpeg")
    assert(out.getAs[Long]("width") == 99L)
    assert(out.getAs[Long]("height") == 1024L)
    assert(out.getAs[Int]("bit_depth") == 12)
    assert(out.getAs[Int]("channels") == 1)
  }

  test("JPEG walk guards: truncation mid-segment, SOS before SOF, " +
      "lost sync, and DHT C4 is NOT a frame header") {
    val good = jpegBytes(
      (0xE0, jfifApp0),
      (0xC0, sofPayload(320, 240, 8, 3)))
    val truncated = good.take(good.length - 9) // cut into the SOF
    val sosFirst = jpegBytes(
      (0xE0, jfifApp0), (0xDA, Array[Byte](1, 1, 0))) // straight to scan
    val lostSync = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE0.toByte, 0x00, 0x05, 1, 2, 3, /* then garbage */ 0x12, 0x34)
    // a C4 (DHT) segment whose payload RESEMBLES an SOF must be
    // skipped by length, not captured
    val dhtNotSof = jpegBytes(
      (0xC4, sofPayload(11, 22, 8, 3)),
      (0xC0, sofPayload(320, 240, 8, 3)))
    val out = binDf(
      (1, truncated), (2, sosFirst), (3, lostSync), (4, dhtNotSof))
      .select(col("id"),
        Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("id", "m.*").orderBy("id").collect()
    for (i <- 0 to 2) {
      assert(out(i).getAs[String]("format") == "jpeg", s"row $i")
      assert(out(i).isNullAt(out(i).fieldIndex("width")), s"row $i")
      assert(out(i).isNullAt(out(i).fieldIndex("channels")), s"row $i")
    }
    assert(out(3).getAs[Long]("width") == 320L)
    assert(out(3).getAs[Long]("height") == 240L)
  }

  test("a JPEG whose SOF sits past the 32-segment walk budget yields " +
      "null dims (format kept), not an infinite walk or a misread") {
    val manyComments = (1 to 40).map(i =>
      (0xFE, s"c$i".getBytes("ASCII"))) // 40 COM segments before SOF
    val jpg = jpegBytes(manyComments :+
      ((0xC0, sofPayload(64, 32, 8, 3))): _*)
    val out = binDf((1, jpg))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[String]("format") == "jpeg")
    assert(out.isNullAt(out.fieldIndex("width")))
    // within budget the same stream decodes
    val okJpg = jpegBytes(manyComments.take(20) :+
      ((0xC0, sofPayload(64, 32, 8, 3))): _*)
    val ok = binDf((1, okJpg))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(ok.getAs[Long]("width") == 64L)
  }

  test("the SOF walk reads REAL JDK-encoder JPEGs: JFIF + tables + " +
      "baseline SOF0, any dimensions") {
    val out = binDf(
      (1, Multimodal.syntheticJpeg(31, 9, seed = 2)),
      (2, Multimodal.syntheticJpeg(8, 23, seed = 5)))
      .select(col("id"),
        Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("id", "m.*").orderBy("id").collect()
    assert(out(0).getAs[String]("format") == "jpeg")
    assert(out(0).getAs[Long]("width") == 31L)
    assert(out(0).getAs[Long]("height") == 9L)
    assert(out(0).getAs[Int]("bit_depth") == 8)
    assert(out(0).getAs[Int]("channels") == 3)
    assert(out(1).getAs[Long]("width") == 8L)
    assert(out(1).getAs[Long]("height") == 23L)
  }

  test("JPEG fill bytes (FF padding before a marker) are stepped over") {
    val sof = Array(0xFF.toByte, 0xC0.toByte, 0x00.toByte,
      0x08.toByte) ++ sofPayload(64, 32, 8, 3)
    val jpg = Array(0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++ sof // 2 fill bytes
    val out = binDf((1, jpg))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[Long]("width") == 64L)
    assert(out.getAs[Long]("height") == 32L)
  }

  test("imageHeaderMeta yields nulls for unrecognized payloads") {
    val out = binDf((1, "not an image".getBytes))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.isNullAt(out.fieldIndex("format")))
    assert(out.isNullAt(out.fieldIndex("width")))
  }

  test("wavHeaderMeta decodes canonical PCM fmt chunk") {
    // minimal canonical WAV header: RIFF<size>WAVEfmt <16 LE>
    // PCM(1), 2 channels, 44100 Hz, block fields, 16 bps, data chunk
    val bb = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(40)
      .put("WAVEfmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(176400)
      .putShort(4).putShort(16)
      .put("data".getBytes("ASCII")).putInt(4)
    val out = binDf((1, bb.array()))
      .select(Multimodal.wavHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[Int]("channels") == 2)
    assert(out.getAs[Long]("sample_rate") == 44100L)
    assert(out.getAs[Int]("bits_per_sample") == 16)
    assert(out.getAs[Long]("data_bytes") == 4L)
  }

  private def mp4Header(timescale: Long, ticks: Long): Array[Byte] = {
    def hex8(v: Long) = f"$v%08x"
    val hexStr = "00000014" + "66747970" + "69736f6d" + "00000200" +
      "69736f6d" + "00000074" + "6d6f6f76" + "0000006c" + "6d766864" +
      "00" + "000000" + "00000000" + "00000000" +
      hex8(timescale) + hex8(ticks)
    hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  test("videoHeaderMeta decodes ftyp brand and mvhd timescale/duration " +
      "via the data-driven box offsets") {
    val d = binDf((1, mp4Header(600, 3000)), (2, "not a video".getBytes))
    val out = d.select(col("id"),
        Multimodal.videoHeaderMeta(col("content")).as("m"))
      .orderBy("id").collect()
    val m1 = out(0).getStruct(1)
    assert(m1.getAs[String]("format") == "mp4")
    assert(m1.getAs[String]("brand") == "isom")
    assert(m1.getAs[Long]("timescale") == 600L)
    assert(m1.getAs[Long]("duration_ticks") == 3000L)
    assert(m1.getAs[Double]("duration_sec") == 5.0)
    val m2 = out(1).getStruct(1)
    assert(m2.isNullAt(m2.fieldIndex("format")))
    assert(m2.isNullAt(m2.fieldIndex("timescale")))
  }

  test("videoHeaderMeta nulls numeric fields for payloads truncated " +
      "mid-mvhd (never misreads)") {
    val full = mp4Header(600, 3000)
    val truncated = full.take(full.length - 6) // cuts into duration
    val d = binDf((1, truncated))
    val m = d.select(Multimodal.videoHeaderMeta(col("content")).as("m"))
      .head().getStruct(0)
    assert(m.getAs[String]("format") == "mp4") // ftyp itself intact
    assert(m.isNullAt(m.fieldIndex("timescale")))
    assert(m.isNullAt(m.fieldIndex("duration_ticks")))
  }

  test("frameSampleTimestamps plans n midpoint timestamps spanning " +
      "the clip") {
    val d = binDf((1, mp4Header(600, 3000))) // 5.0 s
    val ts = d.select(Multimodal.frameSampleTimestamps(
        Multimodal.videoHeaderMeta(col("content"))
          .getField("duration_sec"), 4).as("ts"))
      .head().getSeq[Double](0)
    assert(ts == Seq(0.625, 1.875, 3.125, 4.375)) // midpoints of 4 bins
  }

  test("decodeImageFeatures really decodes pixels: dims + exact mean " +
      "channel stats of a known image") {
    // 2x1 image: pure red and pure blue pixels
    val im = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, 0xff0000)
    im.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val out = Multimodal.decodeImageFeatures(
      binDf((1, bos.toByteArray)), "id", "content", grid = 1).head()
    assert(out.getAs[Int]("width") == 2)
    assert(out.getAs[Int]("height") == 1)
    val f = out.getSeq[Float](out.fieldIndex("features"))
    assert(f.length == 4) // 1x1 luma grid + meanR,G,B
    assert(math.abs(f(1) - 0.5f) < 1e-6) // meanR: (255+0)/2/255
    assert(math.abs(f(2) - 0.0f) < 1e-6) // meanG
    assert(math.abs(f(3) - 0.5f) < 1e-6) // meanB
  }

  test("decodeImageFeatures is deterministic and batches without " +
      "dropping rows; undecodable payloads yield null, not exceptions") {
    val many = (1 to 40).map { i =>
      if (i % 5 == 0) (i, s"garbage-$i".getBytes)
      else (i, Multimodal.syntheticPng(8 + i % 7, 6 + i % 5, seed = i))
    }
    val out = Multimodal.decodeImageFeatures(
      binDf(many: _*), "id", "content", grid = 2, batchSize = 8)
    assert(out.count() == 40)
    assert(out.where(col("features").isNull).count() == 8)
    val a = out.orderBy("id").collect().map(_.toSeq)
    val b = Multimodal.decodeImageFeatures(
      binDf(many: _*), "id", "content", grid = 2, batchSize = 8)
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("decodeImageFeatures roundtrips syntheticPng dims and header " +
      "meta agrees with the pixel decoder") {
    val png = Multimodal.syntheticPng(33, 17, seed = 9)
    val d = binDf((1, png))
    val pixel = Multimodal.decodeImageFeatures(d, "id", "content").head()
    val header = d.select(Multimodal.imageHeaderMeta(col("content"))
      .as("m")).select("m.*").head()
    assert(pixel.getAs[Int]("width") == 33)
    assert(header.getAs[Long]("width") == 33L)
    assert(pixel.getAs[Int]("height") == 17)
    assert(header.getAs[Long]("height") == 17L)
  }

  // independent driver-side replay of the pooled milli-luma grid
  private def poolReplay(png: Array[Byte], gw: Int, gh: Int)
      : (Array[Long], Array[Long]) = {
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    for (y <- 0 until im.getHeight; x <- 0 until im.getWidth) {
      val rgb = im.getRGB(x, y)
      val ml = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
      val cell = math.min(y * gh / im.getHeight, gh - 1) * gw +
        math.min(x * gw / im.getWidth, gw - 1)
      sums(cell) += ml
      counts(cell) += 1
    }
    (sums, counts)
  }

  test("imagePooledLuma matches a per-pixel driver replay exactly, " +
      "including empty trailing cells for images narrower than the " +
      "grid (w = 8 < 9)") {
    for ((w, h, seed) <- Seq((8, 8, 3), (24, 16, 77), (31, 23, 200))) {
      val png = Multimodal.syntheticTexturedPng(w, h, seed)
      val out = Multimodal.imagePooledLuma(
        binDf((1, png)), "id", "content").head()
      val (sums, counts) = poolReplay(png, 9, 8)
      assert(out.getAs[Int]("width") == w)
      assert(out.getSeq[Long](out.fieldIndex("luma_sums")).toSeq ==
        sums.toSeq, s"sums mismatch at ($w,$h,$seed)")
      assert(out.getSeq[Long](out.fieldIndex("cell_counts")).toSeq ==
        counts.toSeq, s"counts mismatch at ($w,$h,$seed)")
      if (w < 9) {
        // the cx=8 column never receives a pixel: min(x*9/8, 8) <= 7
        assert((0 until 8).forall(cy => counts(cy * 9 + 8) == 0L))
      }
    }
  }

  test("imageDHash: identical images hash identically; the bits match " +
      "a driver replay of the cross-multiplied average comparisons") {
    val png = Multimodal.syntheticTexturedPng(20, 14, 123)
    val out = Multimodal.imageDHash(
      binDf((1, png), (2, png)), "id", "content")
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("dhash_hi") == out(1).getAs[Long]("dhash_hi"))
    assert(out(0).getAs[Long]("dhash_lo") == out(1).getAs[Long]("dhash_lo"))
    val (s, c) = poolReplay(png, 9, 8)
    var hi = 0L; var lo = 0L
    for (i <- 0 until 64) {
      val l = (i / 8) * 9 + i % 8
      val bit = if (s(l + 1) * c(l) > s(l) * c(l + 1)) 1L else 0L
      if (i < 32) hi |= bit << (31 - i) else lo |= bit << (63 - i)
    }
    assert(out(0).getAs[Long]("dhash_hi") == hi)
    assert(out(0).getAs[Long]("dhash_lo") == lo)
  }

  test("image near-dup via dHash + hammingBandedPairs: a one-pixel " +
      "edit stays within distance 2 and is caught; a different-seed " +
      "image pairs with neither; undecodable payloads never pair") {
    val orig = Multimodal.syntheticTexturedPng(24, 16, 42)
    // flip one dark pixel to white: affects one pooling cell, so at
    // most the two comparisons adjacent to it
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(orig))
    im.setRGB(2, 3, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val edited = bos.toByteArray
    val other = Multimodal.syntheticTexturedPng(24, 16, 171)
    val sk = Multimodal.imageDHash(
      binDf((1, orig), (2, edited), (3, other), (4, "junk".getBytes)),
      "id", "content")
    assert(sk.where(col("id") === 4)
      .where(col("dhash_hi").isNull).count() == 1)
    val pairs = graft.dedup.Dedup.hammingBandedPairs(
      sk, "id", "dhash_hi", "dhash_lo", maxDist = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1, 2)))
    assert(pairs.head._3 <= 2)
  }

  test("hammingBandedPairs equals brute-force all-pairs scoring at " +
      "maxDist <= 3 (4x16 banding is exact by pigeonhole)") {
    val many = (0 until 60).map(i =>
      (i, Multimodal.syntheticTexturedPng(
        8 + i % 24, 8 + i % 16, i % 12)))
    val sk = Multimodal.imageDHash(binDf(many: _*), "id", "content")
      .select("id", "dhash_hi", "dhash_lo").cache()
    val banded = graft.dedup.Dedup.hammingBandedPairs(
      sk, "id", "dhash_hi", "dhash_lo", maxDist = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val rows = sk.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, ahi, alo) <- rows; (ib, bhi, blo) <- rows if ia < ib
      d = java.lang.Long.bitCount(ahi ^ bhi) +
        java.lang.Long.bitCount(alo ^ blo)
      if d <= 3
    } yield (ia, ib, d)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture should contain identical-image pairs")
  }

  // ---- WebP (RIFF / VP8 / VP8L / VP8X) ---------------------------- //

  /** Assemble a WebP container: RIFF size + "WEBP" + one chunk. */
  private def webpBytes(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(12 + 8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(4 + 8 + payload.length)
      .put("WEBP".getBytes("ASCII"))
      .put(fourcc.getBytes("ASCII")).putInt(payload.length)
      .put(payload)
    bb.array()
  }

  test("sniffMime splits the RIFF container by form type: WEBP vs WAVE") {
    val webp = webpBytes("VP8L", Array[Byte](0x2F, 0, 0, 0, 0))
    val out = binDf((1, webp), (2, riffMagic))
      .select(col("id"), Multimodal.sniffMime(col("content")).as("mime"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "image/webp")
    assert(out(1).getString(1) == "audio/wav")
  }

  test("webp VP8 lossy: dims from the masked LE16 codes — the 2-bit " +
      "rescale hint in the top bits must NOT leak into the size") {
    // width 300 with xscale 2 (code 300 | 2<<14), height 7, scale 0
    val bb = java.nio.ByteBuffer.allocate(10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Array[Byte](0xD0.toByte, 0x0A, 0x00)) // key-frame tag
      .put(Array[Byte](0x9D.toByte, 0x01, 0x2A)) // start code
      .putShort((300 | (2 << 14)).toShort).putShort(7.toShort)
    val out = binDf((1, webpBytes("VP8 ", bb.array())))
      .select(Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("m.*").head()
    assert(out.getAs[String]("format") == "webp")
    assert(out.getAs[Long]("width") == 300L)
    assert(out.getAs[Long]("height") == 7L)
    assert(out.getAs[Int]("bit_depth") == 8)
    assert(out.getAs[Int]("channels") == 3)
  }

  test("webp VP8L lossless: width-1/height-1/alpha unpack from the one " +
      "LE32; alpha hint lifts channels to 4") {
    def packed(w: Int, h: Int, alpha: Int): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
      val bb = java.nio.ByteBuffer.allocate(5)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(0x2F.toByte).putInt(bits)
      bb.array()
    }
    val out = binDf(
      (1, webpBytes("VP8L", packed(16383, 1, 0))),
      (2, webpBytes("VP8L", packed(2, 16000, 1))))
      .select(col("id"), Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("id", "m.*").orderBy("id").collect()
    assert(out(0).getAs[Long]("width") == 16383L)
    assert(out(0).getAs[Long]("height") == 1L)
    assert(out(0).getAs[Int]("channels") == 3)
    assert(out(1).getAs[Long]("width") == 2L)
    assert(out(1).getAs[Long]("height") == 16000L)
    assert(out(1).getAs[Int]("channels") == 4)
  }

  test("webp VP8X extended: LE24 canvas dims are minus-one coded and " +
      "the alpha flag is bit 4 of the flags byte") {
    def vp8x(w: Int, h: Int, flags: Int): Array[Byte] = {
      val p = new Array[Byte](10)
      p(0) = flags.toByte
      p(4) = ((w - 1) & 0xFF).toByte
      p(5) = (((w - 1) >> 8) & 0xFF).toByte
      p(6) = (((w - 1) >> 16) & 0xFF).toByte
      p(7) = ((h - 1) & 0xFF).toByte
      p(8) = (((h - 1) >> 8) & 0xFF).toByte
      p(9) = (((h - 1) >> 16) & 0xFF).toByte
      p
    }
    val out = binDf(
      (1, webpBytes("VP8X", vp8x(70000, 300, 0x10))),
      (2, webpBytes("VP8X", vp8x(1, 1, 0x0E)))) // ICC/EXIF/XMP, no alpha
      .select(col("id"), Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("id", "m.*").orderBy("id").collect()
    assert(out(0).getAs[Long]("width") == 70000L)
    assert(out(0).getAs[Long]("height") == 300L)
    assert(out(0).getAs[Int]("channels") == 4)
    assert(out(1).getAs[Long]("width") == 1L)
    assert(out(1).getAs[Long]("height") == 1L)
    assert(out(1).getAs[Int]("channels") == 3)
  }

  test("webp guards: truncation mid-header, missing VP8 start code, and " +
      "an unknown chunk fourcc all yield format webp with null dims") {
    val goodL = webpBytes("VP8L", Array[Byte](0x2F, 9, 0, 0, 0))
    val truncated = goodL.take(goodL.length - 2) // cut into the LE32
    val noStartCode = webpBytes("VP8 ", Array[Byte](
      0xD0.toByte, 0x0A, 0x00, 0x00, 0x01, 0x2A, 10, 0, 10, 0))
    val unknown = webpBytes("ANMF", new Array[Byte](10))
    val out = binDf((1, truncated), (2, noStartCode), (3, unknown))
      .select(col("id"), Multimodal.imageHeaderMeta(col("content")).as("m"))
      .select("id", "m.*").orderBy("id").collect()
    out.foreach { r =>
      assert(r.getAs[String]("format") == "webp", r.toString)
      assert(r.isNullAt(r.fieldIndex("width")), r.toString)
      assert(r.isNullAt(r.fieldIndex("height")), r.toString)
      assert(r.isNullAt(r.fieldIndex("bit_depth")), r.toString)
      assert(r.isNullAt(r.fieldIndex("channels")), r.toString)
    }
  }
}
