package graft.registry

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.registry.RegistryBase._

/** Multimodal (image / audio / video binary column) queries — query
  * builders plus their DuckDB oracles. Split from
  * [[SimilarityRegistry]] (round 16); member bodies are unchanged.
  * Conventions: see [[graft.SparkEntry]].
  */
private[graft] object MultimodalRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_image_dhash_pairs" -> (imageDHashPairs _),
    "q169_audio_ehash_dedup" -> (audioEhashDedupQ _),
    "q30_binary_fingerprints" -> (binaryFingerprints _),
    "q38_png_header_decode" -> (pngHeaderDecode _),
    "q256_jpeg_header_decode" -> (jpegHeaderDecode _),
    "q270_jpeg_real_roundtrip" -> (jpegRealRoundtrip _),
    "q39_image_pixel_stats" -> (imagePixelStats _),
    "q47_wav_roundtrip" -> (wavRoundtrip _),
    "q63_video_meta" -> (videoMeta _),
    "q274_webp_header_decode" -> (webpHeaderDecode _),
    "q296_tiff_header_decode" -> (tiffHeaderDecode _),
    "q312_gzip_meta" -> (gzipMetaDecode _),
    "q325_zip_eocd" -> (zipEocdDecode _),
    "q343_flac_header_decode" -> (flacHeaderDecode _),
    "q344_tar_header_decode" -> (tarHeaderDecode _),
    "q345_mp3_frame_decode" -> (mp3FrameDecode _),
    "q356_warc_meta" -> (warcMetaDecode _),
    "q357_pdf_shell" -> (pdfShellDecode _),
    "q365_avif_header_decode" -> (avifHeaderDecode _),
    "q379_ico_header_decode" -> (icoHeaderDecode _),
    "q383_id3_tag_decode" -> (id3TagDecode _),
  )

  /** ID3v2 tag decode ([[Multimodal.id3Meta]]): each doc_id plants a
    * 3-frame tag — TIT2/TPE1/TALB Latin-1 text frames with id
    * arithmetic in the payloads. Every 29th id is v2.4, whose TIT2
    * text is right-padded to 130 chars so its SYNCSAFE frame size
    * (0x00000103) genuinely differs from the v2.3 big-endian
    * encoding — the versioned size branch is load-bearing, not
    * decorative. Every 11th id truncates 5 bytes into the second
    * frame (first frame survives, the walk stops); every 19th is not
    * an ID3 stream at all. Closed-form oracle.
    */
  private[graft] def id3TagDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val bad = id % 19 === 0
    val v4 = id % 29 === 0
    val trunc = id % 11 === 0
    def beHex(v: Column): Column = lpad(hex(v), 8, "0")
    def ssHex(v: Column): Column = concat((3 to 0 by -1).map { k =>
      lpad(hex(pmod(shiftright(v, 7 * k), lit(128L))), 2, "0")
    }: _*)
    val t1 = when(v4, rpad(concat(lit("trk"), id.cast("string")),
      130, "x")).otherwise(concat(lit("trk"), id.cast("string")))
    val t2 = concat(lit("artist"), (id % 50).cast("string"))
    val t3 = concat(lit("alb"), (id % 20).cast("string"))
    def sz(t: Column): Column = length(t).cast("long") + 1L
    def szHex(t: Column): Column =
      when(v4, ssHex(sz(t))).otherwise(beHex(sz(t)))
    def frame(fid: String, t: Column): Column = concat(
      lit(fid.map(c => f"${c.toInt}%02X").mkString), szHex(t),
      lit("0000"), lit("00"), hex(t))
    val framesLen = sz(t1) + sz(t2) + sz(t3) + 30L
    val header = concat(lit("494433"),
      when(v4, lit("04")).otherwise(lit("03")), lit("00"), lit("00"),
      ssHex(framesLen))
    val full = concat(header,
      frame("TIT2", t1), frame("TPE1", t2), frame("TALB", t3))
    val bodyHex = when(bad, lit("4D5033206E6F742049443321"))
      .otherwise(when(trunc,
        // 10-byte header + full first frame + 5 bytes of the second
        full.substr(lit(1), ((lit(25L) + sz(t1)) * 2L).cast("int")))
        .otherwise(full))
    Multimodal.id3Frames(
        docs(s, dir).select(id, unhex(bodyHex).as("__bin")), "__bin",
        maxFrames = 3)
      .select(id, col("ver_major"), col("tag_size"),
        explode_outer(col("frames")).as("__f"))
      .select(id, col("ver_major"), col("tag_size"),
        col("__f.frame_idx").as("frame_idx"),
        col("__f.frame_id").as("frame_id"),
        col("__f.size").as("size"),
        col("__f.text").as("text"))
      .orderBy("doc_id", "frame_idx")
  }

  /** ICO/CUR favicon decode ([[Multimodal.icoMeta]]): each doc_id
    * synthesizes an ICONDIR — cursor type on every 17th id, an
    * INVALID nonzero reserved field on every 23rd, two directory
    * entries on every 5th, and a truncation cutting the LAST entry's
    * bytes mid-field on every 13th (so the header and earlier
    * entries still read; a 1-entry truncated icon yields a
    * no-images row via explode_outer). Entry fields carry id
    * arithmetic, width/height exercising the 0-means-256 rule
    * whenever the id lands on a 256 boundary. Closed-form oracle.
    */
  private[graft] def icoHeaderDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val bad = id % 23 === 0
    val cur = id % 17 === 0
    val cnt = when(id % 5 === 0, 2L).otherwise(1L)
    val trunc = id % 13 === 0
    def leHex(v: Column, n: Int): Column = concat((0 until n).map {
      k => lpad(hex(pmod(shiftright(v, 8 * k), lit(256L))), 2, "0")
    }: _*)
    def entry(i: Int): Column = concat(
      leHex(pmod(id + 37L * i, lit(256L)), 1),
      leHex(pmod(id * 3L + 11L * i, lit(256L)), 1),
      lit("0000"), lit("0100"),
      leHex(when((id + i) % 7 === 0, 8L).otherwise(32L), 2),
      leHex(lit(1000L) + pmod(id, lit(997L)) + i, 4),
      leHex(lit(6L) + cnt * 16L + lit(i * 1000L), 4))
    val header = concat(
      when(bad, lit("0100")).otherwise(lit("0000")),
      when(cur, lit("0200")).otherwise(lit("0100")),
      leHex(cnt, 2))
    val full = concat(header, entry(0),
      when(cnt === 2L, entry(1)).otherwise(lit("")))
    // truncation keeps 2·(6+16·cnt−9) hex chars = 32·cnt − 6: the
    // header plus all but the final 9 bytes of the LAST entry
    val hx = when(trunc,
      full.substr(lit(1), (lit(32L) * cnt - 6L).cast("int")))
      .otherwise(full)
    // stage the assembled bytes AND the decoded struct each behind a
    // projection (the q256/q274 "project once, extract after" rule):
    // icoMeta reads the payload ~40 times, and the field extraction
    // reads the struct 3+ times — inlined, the hex assembly would
    // re-evaluate at every read
    docs(s, dir).select(id, unhex(hx).as("__bin"))
      .select(id, Multimodal.icoMeta(col("__bin"), maxImages = 4)
        .as("__m"))
      .select(id, col("__m.format").as("format"),
        col("__m.n_images").as("n_images"),
        explode_outer(col("__m.images")).as("__img"))
      .select(id, col("format"), col("n_images"),
        col("__img.img_idx").as("img_idx"),
        col("__img.width").as("width"),
        col("__img.height").as("height"),
        col("__img.bpp").as("bpp"),
        col("__img.bytes_in_res").as("bytes_in_res"),
        col("__img.img_offset").as("img_offset"))
      .orderBy("doc_id", "img_idx")
  }

  /** AVIF/HEIF dimension decode ([[Multimodal.avifHeaderMeta]]):
    * each doc_id synthesizes a real ISO-BMFF layout — ftyp (avif,
    * heic on every 10th id), then a meta FullBox whose children are
    * a REAL 33-byte hdlr the walk must skip by size, then
    * iprp → ipco with a 16-byte pixi property BEFORE ispe (so both
    * bounded walks prove they skip siblings, not read fixed
    * offsets) — with the ispe width/height carrying id arithmetic.
    * Every 13th id truncates mid-ispe (after the width field):
    * format/brand still read, dimensions gate to null. Every 17th
    * id is an `isom` ftyp — not the still-image family, all null.
    * Closed-form oracle.
    */
  private[graft] def avifHeaderDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val brandHex = when(id % 17 === 0, lit("69736F6D"))     // isom
      .when(id % 10 === 0, lit("68656963"))                 // heic
      .otherwise(lit("61766966"))                           // avif
    val ftyp = concat(lit("0000001066747970"), brandHex,
      lit("00000000"))
    val hdlr = concat(lit("0000002168646C72"), lit("00000000"),
      lit("00000000"), lit("70696374"),
      lit("00" * 12), lit("00"))
    val pixi = lit("0000001070697869" + "00000000" + "03" + "080808")
    val width = lit(100L) + id % 900
    val height = lit(50L) + (id * 3) % 700
    val ispeHead = lit("0000001469737065" + "00000000")
    val ispe = concat(ispeHead, lpad(hex(width), 8, "0"),
      lpad(hex(height), 8, "0"))
    // ipco = 8 + 16 + 20 = 44; iprp = 8 + 44 = 52;
    // meta = 12 + 33 + 52 = 97 (0x61)
    val ipcoHead = lit("0000002C6970636F")
    val iprpHead = lit("0000003469707270")
    val metaHead = lit("000000616D657461" + "00000000")
    val full = concat(ftyp, metaHead, hdlr, iprpHead, ipcoHead,
      pixi, ispe)
    // truncated: cut right after the ispe width field
    val cut = concat(ftyp, metaHead, hdlr, iprpHead, ipcoHead,
      pixi, ispeHead, lpad(hex(width), 8, "0"))
    val payload = when(id % 13 === 0 && id % 17 =!= 0, cut)
      .otherwise(full)
    docs(s, dir)
      .select(id, unhex(payload).as("__bin"))
      .select(id, Multimodal.avifHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.brand").as("brand"), col("m.width").as("width"),
        col("m.height").as("height"))
      .orderBy("doc_id")
  }

  /** WARC record header decode ([[Multimodal.warcHeaderMeta]]): each
    * doc_id synthesizes a spec-layout record — version line, five
    * named headers (one case-flipped on even ids to prove the
    * case-insensitive match), blank line, payload — and the decode
    * must recover every field plus the header_len skip distance
    * WITHOUT touching the payload. Every 13th id has no blank line
    * (a truncated record): all-null, never a misread. Closed-form
    * oracle including the header_len length arithmetic.
    */
  private[graft] def warcMetaDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val wtype = when(id % 3 === 0, "response")
      .when(id % 3 === 1, "request").otherwise(lit("metadata"))
    val uri = concat(lit("https://site"), (id % 50).cast("string"),
      lit(".com/page"), id.cast("string"))
    val date = concat(lit("2024-03-"),
      lpad((id % 28 + 1).cast("string"), 2, "0"),
      lit("T12:00:00Z"))
    val clen = (id * 7 + 100).cast("string")
    val rid = concat(lit("<urn:uuid:"), id.cast("string"), lit(">"))
    val typeName = when(id % 2 === 0, "warc-type")
      .otherwise(lit("WARC-Type"))
    val rec = concat(
      lit("WARC/1.0\r\n"),
      typeName, lit(": "), wtype, lit("\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("Content-Length: "), clen, lit("\r\n"),
      lit("WARC-Record-ID: "), rid, lit("\r\n"),
      lit("\r\n"),
      lit("payload-bytes-not-to-be-read"))
    val truncated = concat(lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), wtype, lit("\r\n"))
    val payload = encode(
      when(id % 13 === 0, truncated).otherwise(rec), "ISO-8859-1")
    docs(s, dir)
      .select(id, payload.as("__bin"))
      .select(id, Multimodal.warcHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.version").as("version"),
        col("m.warc_type").as("warc_type"),
        col("m.target_uri").as("target_uri"),
        col("m.warc_date").as("warc_date"),
        col("m.content_length").as("content_length"),
        col("m.record_id").as("record_id"),
        col("m.header_len").as("header_len"))
      .orderBy("doc_id")
  }

  /** PDF shell decode ([[Multimodal.pdfShellMeta]]): each doc_id
    * synthesizes a `%PDF-1.x` shell with a variable-length body and
    * the `startxref\\n<offset>\\n%%EOF` trailer — version read from
    * the head, the xref bootstrap read FROM THE END (the
    * gzip-trailer discipline). Every 13th id lacks the %%EOF
    * terminator (has_eof = 0, format null — a truncated download);
    * every 17th isn't a PDF at all (all-null). Closed-form oracle.
    */
  private[graft] def pdfShellDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val xref = (id * 3 + 9).cast("string")
    val body = repeat(lit("x"), (id % 50 + 40).cast("int"))
    val full = concat(lit("%PDF-1."), (id % 8).cast("string"),
      lit("\n"), body, lit("\nstartxref\n"), xref, lit("\n%%EOF"))
    val noEof = concat(lit("%PDF-1."), (id % 8).cast("string"),
      lit("\n"), body)
    val notPdf = concat(lit("%!PS-Adobe "), body)
    val payload = encode(
      when(id % 17 === 0, notPdf)
        .when(id % 13 === 0, noEof).otherwise(full), "ISO-8859-1")
    docs(s, dir)
      .select(id, payload.as("__bin"))
      .select(id, Multimodal.pdfShellMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.version").as("version"),
        col("m.startxref").as("startxref"),
        col("m.has_eof").as("has_eof"),
        col("m.bytes").as("bytes"))
      .orderBy("doc_id")
  }

  /** FLAC STREAMINFO decode ([[Multimodal.flacHeaderMeta]]): each
    * doc_id synthesizes a fLaC header whose 64-bit packed group
    * (rate/channels/bits/total-samples) embeds id arithmetic,
    * including a >2³² total-samples plant on every 5th id so the
    * 36-bit reassembly across the two 32-bit halves is proven, and
    * the 16-byte MD5 signature carries a closed-form byte pattern.
    * Every 13th id truncates after the magic — all-null, never a
    * misread. Closed-form oracle.
    */
  private[graft] def flacHeaderDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val sr = (id % 12 + 1) * 4000
    val ch = id % 2 + 1
    val bits = (id % 3) * 4 + 8
    val total = id * 1000 + 7
    val minF = id % 100 + 14
    val maxF = id % 1000 + 500
    val crc = (id * lit(2654435761L)) % lit(4294967296L)
    val md5Hex = repeat(beHexN(crc, 4), 4)
    val hiTop = when(id % 5 === 0, 3L).otherwise(0L)
    val hi = sr.cast("long") * 4096L + (ch - 1).cast("long") * 512L +
      (bits - 1).cast("long") * 16L + hiTop
    val fileHex = concat(lit("664C6143"), lit("80"), lit("000022"),
      lit("1000"), lit("1000"), beHexN(minF, 3), beHexN(maxF, 3),
      beHexN(hi, 4), beHexN(total, 4), md5Hex)
    val payload = when(id % 13 === 0, lit("664C6143"))
      .otherwise(fileHex)
    docs(s, dir)
      .select(id, unhex(payload).as("__bin"))
      .select(id, Multimodal.flacHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.min_blocksize").as("min_blocksize"),
        col("m.max_blocksize").as("max_blocksize"),
        col("m.min_framesize").as("min_framesize"),
        col("m.max_framesize").as("max_framesize"),
        col("m.sample_rate").as("sample_rate"),
        col("m.channels").as("channels"),
        col("m.bits_per_sample").as("bits_per_sample"),
        col("m.total_samples").as("total_samples"),
        col("m.md5_hex").as("md5_hex"))
      .orderBy("doc_id")
  }

  /** POSIX ustar header decode ([[Multimodal.tarHeaderMeta]]): each
    * doc_id synthesizes a full 512-byte header whose octal fields
    * (mode/uid/gid/size/mtime/checksum) embed id arithmetic in the
    * spec's NUL/space-padded ASCII-octal layout — the hash proves
    * the substring→trim→conv(_, 8, 10) walk, the 512-rounded
    * `entry_bytes` planner number, and the dir-typeflag variant on
    * every 10th id. Every 13th id truncates to the name field alone
    * — all-null, never a misread. Closed-form oracle.
    */
  private[graft] def tarHeaderDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val name = concat(lit("f"), id.cast("string"), lit(".txt"))
    def padded(strHex: Column, field: Int, used: Column): Column =
      concat(strHex, repeat(lit("00"),
        (lit(field) - used).cast("int")))
    def octField(v: Column, digits: Int): Column =
      concat(hex(lpad(conv(v.cast("string"), 10, 8), digits, "0")),
        lit("00"))
    val mode = lit(384L) + id % 64
    val uid = id % 1000
    val gid = (id * 3) % 1000
    val size = id * 3 + 5
    val mtime = lit(1700000000L) + id
    val chksum = (id * 7) % 262144
    val typeflag = when(id % 10 === 0, lit("35")).otherwise(lit("30"))
    val uname = concat(lit("u"), (id % 10).cast("string"))
    val fileHex = concat(
      padded(hex(name), 100, length(name)),       // name
      octField(mode, 7),                          // mode (8)
      octField(uid, 7),                           // uid (8)
      octField(gid, 7),                           // gid (8)
      octField(size, 11),                         // size (12)
      octField(mtime, 11),                        // mtime (12)
      concat(hex(lpad(conv(chksum.cast("string"), 10, 8), 6, "0")),
        lit("0020")),                             // chksum "%06o\0 "
      typeflag,                                   // typeflag (1)
      repeat(lit("00"), 100),                     // linkname
      lit("757374617200"), lit("3030"),           // magic+version
      padded(hex(uname), 32, length(uname)),      // uname
      repeat(lit("00"), 32),                      // gname
      repeat(lit("00"), 8), repeat(lit("00"), 8), // dev major/minor
      repeat(lit("00"), 155),                     // prefix
      repeat(lit("00"), 12))                      // block padding
    val payload = when(id % 13 === 0,
      padded(hex(name), 100, length(name))).otherwise(fileHex)
    docs(s, dir)
      .select(id, unhex(payload).as("__bin"))
      .select(id, Multimodal.tarHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.name").as("name"), col("m.mode").as("mode"),
        col("m.uid").as("uid"), col("m.gid").as("gid"),
        col("m.size").as("size"), col("m.mtime").as("mtime"),
        col("m.checksum").as("checksum"),
        col("m.typeflag").as("typeflag"),
        col("m.uname").as("uname"),
        col("m.entry_bytes").as("entry_bytes"))
      .orderBy("doc_id")
  }

  /** MPEG-1 Layer III frame header decode
    * ([[Multimodal.mp3FrameMeta]]): each doc_id synthesizes a sync
    * header cycling through all 14 bitrate indexes, the 3 valid
    * samplerate indexes, both padding bits and all 4 channel modes —
    * the hash proves the spec-table CASE resolution and the mirrored
    * ⌊144·kbps·1000/rate⌋+pad frame pricing. Every 13th id truncates
    * after the sync byte — all-null, never a misread. Closed-form
    * oracle carrying the same literal tables.
    */
  private[graft] def mp3FrameDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val brIdx = id % 14 + 1
    val srIdx = id % 3
    val pad = id % 2
    val mode = id % 4
    val b3 = brIdx * 16 + srIdx * 4 + pad * 2
    val b4 = mode * 64
    val fileHex = concat(lit("FFFB"), beHexN(b3, 1), beHexN(b4, 1),
      lit("00112233445566"))
    val payload = when(id % 13 === 0, lit("FF")).otherwise(fileHex)
    docs(s, dir)
      .select(id, unhex(payload).as("__bin"))
      .select(id, Multimodal.mp3FrameMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.bitrate_kbps").as("bitrate_kbps"),
        col("m.sample_rate").as("sample_rate"),
        col("m.padding").as("padding"),
        col("m.channel_mode").as("channel_mode"),
        col("m.frame_bytes").as("frame_bytes"))
      .orderBy("doc_id")
  }

  /** ZIP EOCD + first-central-directory-entry inventory
    * ([[Multimodal.zipEocdMeta]]): each doc_id synthesizes an archive
    * with a variable-length local section (so the CD offset — which
    * the decoder must READ, not assume — moves with doc_id%7), a CD
    * entry embedding the id in its name/method/sizes/CRC, and the
    * EOCD claiming doc_id%3+1 entries. Every 13th id truncates after
    * the magic: all-null, never a misread. Closed-form oracle; the
    * hash proves the from-the-end EOCD read AND the data-dependent
    * CD jump.
    */
  private[graft] def zipEocdDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val j = (id % 7 + 1).cast("int")
    val junk = concat(lit("504B0304"),
      lit("4C4C4C4C4C4C4C").substr(lit(1), j * 2))
    val name = concat(lit("f"), id.cast("string"), lit(".txt"))
    val nameLen = length(name).cast("long")
    val method = when(id % 2 === 0, lit(0L)).otherwise(lit(8L))
    val crc = (id * lit(2654435761L)) % lit(4294967296L)
    val csize = id * 3L + 1L
    val usize = id * 5L + 2L
    val cdHex = concat(lit("504B0102"), lit("14001400"),
      lit("0000"), leHex(method, 2), lit("00000000"),
      leHex(crc, 4), leHex(csize, 4), leHex(usize, 4),
      leHex(nameLen, 2),
      lit("0000" + "0000" + "0000" + "0000" + "00000000" +
        "00000000"),
      hex(name))
    val entries = (id % 3 + 1).cast("long")
    val cdSize = lit(46L) + nameLen
    val cdOff = lit(4L) + (id % 7 + 1).cast("long")
    val eocdHex = concat(lit("504B0506"), lit("0000" + "0000"),
      leHex(entries, 2), leHex(entries, 2),
      leHex(cdSize, 4), leHex(cdOff, 4), lit("0000"))
    val fileHex = when(id % 13 === 0, lit("504B"))
      .otherwise(concat(junk, cdHex, eocdHex))
    docs(s, dir)
      .select(id, unhex(fileHex).as("__bin"))
      .select(id, Multimodal.zipEocdMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.n_entries").as("n_entries"),
        col("m.cd_size").as("cd_size"),
        col("m.cd_offset").as("cd_offset"),
        col("m.first_name").as("first_name"),
        col("m.first_method").as("first_method"),
        col("m.first_csize").as("first_csize"),
        col("m.first_usize").as("first_usize"),
        col("m.first_crc32").as("first_crc32"))
      .orderBy("doc_id")
  }

  /** GZIP member metadata ([[Multimodal.gzipMeta]]): each doc_id
    * synthesizes an RFC 1952 member in its doc_id%3 flavor — bare
    * header, FNAME, or FEXTRA+FNAME — so the name and trailer sit at
    * VARIABLE positions the FLG-bit walk must find (xlen = id%5+2
    * pads the extra field, the name embeds the id). Every 13th id is
    * truncated after the magic: the length gate must yield all-null,
    * never a misread. The oracle is the closed form of the id
    * arithmetic — the hash proves the walk recovers every planted
    * field, including the from-the-END trailer reads (CRC32/ISIZE).
    */
  private[graft] def gzipMetaDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val flavor = id % 3
    val name = concat(lit("f"), id.cast("string"), lit(".txt"))
    val xlen = (id % 5 + 2).cast("long")
    val extraHex = concat(leHex(xlen, 2),
      lit("414141414141").substr(lit(1), (xlen * 2).cast("int")))
    val flgHex = when(flavor === 0, "00").when(flavor === 1, "08")
      .otherwise("0C")
    val mtime = lit(1700000000L) + id
    val os = (id % 14).cast("long")
    val xfl = when(id % 2 === 0, lit(2L)).otherwise(lit(4L))
    val crc = (id * lit(2654435761L)) % lit(4294967296L)
    val isize = id * 7L + 4L
    val fileHex = concat(lit("1F8B08"), flgHex, leHex(mtime, 4),
      leHex(xfl, 1), leHex(os, 1),
      when(flavor === 2, extraHex).otherwise(lit("")),
      when(flavor >= 1, concat(hex(name), lit("00")))
        .otherwise(lit("")),
      lit("41424344"), leHex(crc, 4), leHex(isize, 4))
    val hexCol = when(id % 13 === 0, lit("1F8B08")).otherwise(fileHex)
    docs(s, dir)
      .select(id, unhex(hexCol).as("__bin"))
      .select(id, Multimodal.gzipMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.mtime").as("mtime"), col("m.os").as("os"),
        col("m.xfl").as("xfl"), col("m.has_extra").as("has_extra"),
        col("m.xlen").as("xlen"), col("m.fname").as("fname"),
        col("m.header_len").as("header_len"),
        col("m.isize").as("isize"), col("m.crc32").as("crc32"))
      .orderBy("doc_id")
  }

  /** Big-endian hex of a column value, n bytes. */
  private def beHexN(v: Column, n: Int): Column =
    lpad(hex(v.cast("long")), n * 2, "0")

  /** Endian-selected hex of a column value, n bytes — TIFF payloads
    * carry their own byte order, so the test payload builder swaps
    * per row.
    */
  private def eHex(v: Column, n: Int, le: Column): Column =
    when(le, leHex(v, n)).otherwise(beHexN(v, n))

  /** TIFF/EXIF IFD0 decode ([[Multimodal.tiffHeaderMeta]]) over
    * synthesized payloads that exercise the walk, not an offset:
    * byte order ALTERNATES per doc (II/MM — every read dispatches),
    * the IFD sits after doc_id-dependent padding (its position is
    * read from the header, never assumed), width's type alternates
    * SHORT/LONG, a decoy tag precedes the wanted ones, and every
    * 17th payload is truncated mid-header (must null, never
    * misread). The oracle is the closed form of the same doc_id
    * arithmetic — the hash proves the byte walk end to end.
    */
  private[graft] def tiffHeaderDecode(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val le = id % 2 === 0
    val pad = (id % 9).cast("int")
    val w = (id % 640 + 16).cast("long")
    val h = ((id * 7) % 480 + 16).cast("long")
    val orient = (id % 8 + 1).cast("long")
    val wideW = id % 3 === 0 // width as LONG instead of SHORT
    def entryShort(tag: Int, v: Column, leC: Column): Column = concat(
      eHex(lit(tag), 2, leC), eHex(lit(3), 2, leC),
      eHex(lit(1), 4, leC), eHex(v, 2, leC), lit("0000"))
    def entryLong(tag: Int, v: Column, leC: Column): Column = concat(
      eHex(lit(tag), 2, leC), eHex(lit(4), 2, leC),
      eHex(lit(1), 4, leC), eHex(v, 4, leC))
    val ifdOff = (lit(8) + pad).cast("long")
    val full = concat(
      when(le, lit("49492A00")).otherwise(lit("4D4D002A")),
      eHex(ifdOff, 4, le),
      repeat(lit("00"), pad),
      eHex(lit(5), 2, le), // entry count
      entryLong(0x00FE, lit(0L), le), // decoy: NewSubfileType
      when(wideW, entryLong(0x0100, w, le))
        .otherwise(entryShort(0x0100, w, le)),
      entryShort(0x0101, h, le),
      entryShort(0x0102, lit(8L), le),
      entryShort(0x0112, orient, le),
      lit("00000000")) // no next IFD
    val payload = when(id % 17 === 0, substring(full, 1, 12))
      .otherwise(full)
    docs(s, dir)
      .select(id, unhex(payload).as("__bin"))
      .select(id, Multimodal.tiffHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.byte_order").as("byte_order"),
        col("m.n_entries").as("n_entries"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.orientation").as("orientation"),
        col("m.bits_per_sample").as("bits_per_sample"))
      .orderBy("doc_id")
  }

  /** Little-endian hex of a column value, n bytes — for assembling
    * RIFF test payloads in pure SQL.
    */
  private def leHex(v: Column, n: Int): Column =
    concat((0 until n).map(i =>
      lpad(hex(shiftright(v.cast("long"), 8 * i)
        .bitwiseAND(lit(0xFFL))), 2, "0")): _*)

  /** WebP header decode across all three VP8 chunk flavors
    * ([[Multimodal.webpHeaderMeta]] via the [[Multimodal
    * .imageHeaderMeta]] mime dispatch): each doc_id synthesizes a
    * container in its doc_id%3 flavor — "VP8 " (lossy: key-frame
    * start code, masked LE16 dims), "VP8L" (lossless: one packed
    * LE32 carrying width−1/height−1/alpha-hint) or "VP8X" (extended:
    * flags byte + LE24 canvas dims−1) — with dimensions spanning the
    * multi-byte range (width to 315, height to 207), so a flavor
    * mix-up or endianness/mask slip breaks the oracle hash. Channels
    * prove the alpha path: 3 for VP8, 3+alpha for VP8L/VP8X.
    */
  private[graft] def webpHeaderDecode(
      s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val w = (id % 300 + 16).cast("long")
    val h = (id % 200 + 8).cast("long")
    val alpha = (id % 2).cast("long")
    val flavor = id % 3
    // "VP8 ": frame tag (key frame, bit 0 of byte 0 clear), start
    // code 9D 01 2A, LE16 width/height codes (scale bits 0)
    val vp8 = concat(lit("56503820"), leHex(lit(10L), 4),
      lit("D00A00" + "9D012A"), leHex(w, 2), leHex(h, 2))
    // "VP8L": signature 2F + packed LE32
    // (width−1) | (height−1)<<14 | alpha<<28
    val v8lBits = (w - 1) + (h - 1) * lit(16384L) +
      alpha * lit(268435456L)
    val vp8l = concat(lit("5650384C"), leHex(lit(5L), 4),
      lit("2F"), leHex(v8lBits, 4))
    // "VP8X": flags (bit 4 = alpha), 3 reserved bytes, LE24 dims−1
    val vp8x = concat(lit("56503858"), leHex(lit(10L), 4),
      when(alpha === 1, lit("10")).otherwise(lit("00")),
      lit("000000"), leHex(w - 1, 3), leHex(h - 1, 3))
    val chunk = when(flavor === 0, vp8)
      .when(flavor === 1, vp8l).otherwise(vp8x)
    // RIFF size = "WEBP"(4) + chunk header(8) + payload
    val riffSize = when(flavor === 1, lit(17L)).otherwise(lit(22L))
    val fileHex = concat(lit("52494646"), leHex(riffSize, 4),
      lit("57454250"), chunk)
    // stage the assembled bytes behind a projection: the decode tree
    // reads the payload ~15 times (mime sniff + per-field offsets),
    // and inlined it would re-evaluate the whole hex assembly per
    // read — the q256 "project once, extract after" rule
    docs(s, dir)
      .select(id, unhex(fileHex).as("__bin"))
      .select(id, Multimodal.imageHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.bit_depth").as("bit_depth"),
        col("m.channels").as("channels"))
      .orderBy("doc_id")
  }

  def oracleSql: Map[String, String] = Map(
    // closed form of the planted ID3 tag: truncation keeps frame 0
    // only; the v2.4/v2.3 size-encoding difference is invisible here
    // BECAUSE the decode normalizes it — the engine reads syncsafe
    // vs big-endian bytes and lands on the same integers
    "q383_id3_tag_decode" ->
      """WITH d AS (
           SELECT doc_id, (doc_id % 19 = 0) AS bad,
             (doc_id % 29 = 0) AS v4, (doc_id % 11 = 0) AS trunc
           FROM documents),
         tx AS (
           SELECT *,
             CASE WHEN v4
               THEN rpad('trk' || CAST(doc_id AS VARCHAR), 130, 'x')
               ELSE 'trk' || CAST(doc_id AS VARCHAR) END AS t1,
             'artist' || CAST(doc_id % 50 AS VARCHAR) AS t2,
             'alb' || CAST(doc_id % 20 AS VARCHAR) AS t3
           FROM d),
         sz AS (
           SELECT *, length(t1) + 1 AS s1, length(t2) + 1 AS s2,
             length(t3) + 1 AS s3
           FROM tx),
         frames AS (
           SELECT doc_id,
             CAST(CASE WHEN v4 THEN 4 ELSE 3 END AS BIGINT)
               AS ver_major,
             CAST(s1 + s2 + s3 + 30 AS BIGINT) AS tag_size,
             CAST(i AS INT) AS frame_idx,
             CASE i WHEN 0 THEN 'TIT2' WHEN 1 THEN 'TPE1'
               ELSE 'TALB' END AS frame_id,
             CAST(CASE i WHEN 0 THEN s1 WHEN 1 THEN s2 ELSE s3 END
               AS BIGINT) AS size,
             CASE i WHEN 0 THEN t1 WHEN 1 THEN t2 ELSE t3 END
               AS text
           FROM sz, LATERAL (SELECT unnest(generate_series(0,
             CASE WHEN trunc THEN 0 ELSE 2 END)) AS i) g
           WHERE NOT bad),
         empty AS (
           SELECT doc_id, CAST(NULL AS BIGINT) AS ver_major,
             CAST(NULL AS BIGINT) AS tag_size,
             CAST(NULL AS INT) AS frame_idx,
             CAST(NULL AS VARCHAR) AS frame_id,
             CAST(NULL AS BIGINT) AS size,
             CAST(NULL AS VARCHAR) AS text
           FROM d WHERE bad)
         SELECT * FROM frames UNION ALL SELECT * FROM empty
         ORDER BY doc_id, frame_idx NULLS FIRST""",
    // closed form of the planted ICONDIR: per-image rows for every
    // complete entry (truncation drops the LAST entry), one
    // null-image row for invalid headers and truncated-to-empty
    // icons; NULLS FIRST pinned to Spark's asc null order
    "q379_ico_header_decode" ->
      """WITH d AS (
           SELECT doc_id, (doc_id % 23 = 0) AS bad,
             (doc_id % 17 = 0) AS cur,
             CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS cnt,
             (doc_id % 13 = 0) AS trunc
           FROM documents),
         imgs AS (
           SELECT doc_id,
             CASE WHEN cur THEN 'cur' ELSE 'ico' END AS format,
             CAST(cnt AS BIGINT) AS n_images,
             CAST(i AS INT) AS img_idx,
             CAST(CASE WHEN (doc_id + 37 * i) % 256 = 0 THEN 256
               ELSE (doc_id + 37 * i) % 256 END AS BIGINT) AS width,
             CAST(CASE WHEN (doc_id * 3 + 11 * i) % 256 = 0 THEN 256
               ELSE (doc_id * 3 + 11 * i) % 256 END AS BIGINT)
               AS height,
             CAST(CASE WHEN (doc_id + i) % 7 = 0 THEN 8 ELSE 32 END
               AS BIGINT) AS bpp,
             CAST(1000 + doc_id % 997 + i AS BIGINT) AS bytes_in_res,
             CAST(6 + 16 * cnt + i * 1000 AS BIGINT) AS img_offset
           FROM d, LATERAL (SELECT unnest(generate_series(0, cnt - 1))
             AS i) g
           WHERE NOT bad AND NOT (trunc AND i = cnt - 1)),
         empty AS (
           SELECT doc_id,
             CASE WHEN bad THEN NULL
               WHEN cur THEN 'cur' ELSE 'ico' END AS format,
             CASE WHEN bad THEN NULL
               ELSE CAST(cnt AS BIGINT) END AS n_images,
             CAST(NULL AS INT) AS img_idx,
             CAST(NULL AS BIGINT) AS width,
             CAST(NULL AS BIGINT) AS height,
             CAST(NULL AS BIGINT) AS bpp,
             CAST(NULL AS BIGINT) AS bytes_in_res,
             CAST(NULL AS BIGINT) AS img_offset
           FROM d WHERE bad OR (trunc AND cnt = 1))
         SELECT * FROM imgs UNION ALL SELECT * FROM empty
         ORDER BY doc_id, img_idx NULLS FIRST""",
    // closed form of the zip builder's doc_id arithmetic — the hash
    // proves the from-the-end EOCD read and the data-dependent CD
    // jump (the offset moves with doc_id%7)
    "q325_zip_eocd" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'zip' END
             AS format,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id % 3 + 1 END AS BIGINT) AS n_entries,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 46 + 5 + len(CAST(doc_id AS VARCHAR)) END
             AS BIGINT) AS cd_size,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 5 + doc_id % 7 END AS BIGINT) AS cd_offset,
           CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 'f' || CAST(doc_id AS VARCHAR) || '.txt' END
             AS first_name,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 2 = 0 THEN 0 ELSE 8 END AS BIGINT)
             AS first_method,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id * 3 + 1 END AS BIGINT) AS first_csize,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id * 5 + 2 END AS BIGINT) AS first_usize,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE (doc_id * 2654435761) % 4294967296 END AS BIGINT)
             AS first_crc32
         FROM documents ORDER BY doc_id""",
    // closed form of the gzip builder's doc_id arithmetic — the hash
    // proves the FLG-bit walk and the from-the-end trailer reads
    "q312_gzip_meta" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'gzip' END
             AS format,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 1700000000 + doc_id END AS BIGINT) AS mtime,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id % 14 END AS BIGINT) AS os,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 2 = 0 THEN 2 ELSE 4 END AS BIGINT) AS xfl,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END AS INT)
             AS has_extra,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 3 = 2 THEN doc_id % 5 + 2 ELSE 0 END
             AS BIGINT) AS xlen,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 3 = 0 THEN NULL
             ELSE 'f' || CAST(doc_id AS VARCHAR) || '.txt' END
             AS fname,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 10
               + (CASE WHEN doc_id % 3 = 2
                   THEN 2 + doc_id % 5 + 2 ELSE 0 END)
               + (CASE WHEN doc_id % 3 >= 1
                   THEN 6 + len(CAST(doc_id AS VARCHAR)) ELSE 0 END)
             END AS BIGINT) AS header_len,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id * 7 + 4 END AS BIGINT) AS isize,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE (doc_id * 2654435761) % 4294967296 END AS BIGINT)
             AS crc32
         FROM documents ORDER BY doc_id""",
    // closed form of the payload builder's doc_id arithmetic — the
    // hash proves the endian-dispatched IFD walk, not an offset
    "q296_tiff_header_decode" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 'tiff' END
             AS format,
           CASE WHEN doc_id % 17 = 0 THEN NULL
             WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
             AS byte_order,
           CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 5 END
             AS INT) AS n_entries,
           CAST(CASE WHEN doc_id % 17 = 0 THEN NULL
             ELSE doc_id % 640 + 16 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 17 = 0 THEN NULL
             ELSE (doc_id * 7) % 480 + 16 END AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 17 = 0 THEN NULL
             ELSE doc_id % 8 + 1 END AS INT) AS orientation,
           CAST(CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 8 END
             AS INT) AS bits_per_sample
         FROM documents ORDER BY doc_id""",
    // q274: the q38/q256 treatment for WebP — the oracle recomputes
    // every field from the doc_id formulas; Spark must round-trip
    // them through actual RIFF bytes across ALL THREE VP8 chunk
    // flavors (dimensions live at different offsets and encodings:
    // masked LE16, packed LE32, LE24-minus-one)
    "q274_webp_header_decode" ->
      """SELECT doc_id,
         'webp' AS format,
         CAST(doc_id % 300 + 16 AS BIGINT) AS width,
         CAST(doc_id % 200 + 8 AS BIGINT) AS height,
         CAST(8 AS INT) AS bit_depth,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 3
                   ELSE 3 + doc_id % 2 END AS INT) AS channels
         FROM documents ORDER BY doc_id""",
    // full decode→pool→hash replay in integer arithmetic: synthetic
    // pixels are (x,y,seed) formulas (q39), milli-luma sums are
    // integers, dHash bits compare averages by cross-multiplication —
    // no float anywhere. All-pairs scoring matches the engine's banded
    // join because 4×16 banding is exact at distance <= 3.
    "q122_image_dhash_pairs" ->
      """WITH p AS (
           SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) AS w,
             CAST(doc_id % 16 + 8 AS INT) AS h,
             CAST(doc_id % 336 AS INT) AS seed
           FROM documents),
         xs AS (SELECT doc_id, w, h, seed, unnest(range(w)) AS x FROM p),
         px AS (SELECT doc_id, w, h, seed, x,
                  unnest(range(h)) AS y FROM xs),
         lum AS (
           SELECT doc_id,
             least(y * 8 // h, 7) AS cy, least(x * 9 // w, 8) AS cx,
             299 * ((x*(37 + 13*(seed%5)) + y*(23 + 7*(seed%3)) + seed)
                 % 256)
               + 587 * ((x*x*(seed%4 + 1) + y*29 + 2*seed) % 256)
               + 114 * ((x*53 + y*41 + x*y + 5*seed) % 256) AS ml
           FROM px),
         cells AS (
           SELECT doc_id, cy, cx, sum(ml) AS s, count(*) AS c
           FROM lum GROUP BY 1, 2, 3),
         bits AS (
           SELECT l.doc_id, l.cy, l.cx,
             CASE WHEN r.s * l.c > l.s * r.c THEN 1 ELSE 0 END AS bit
           FROM cells l JOIN cells r
             ON r.doc_id = l.doc_id AND r.cy = l.cy AND r.cx = l.cx + 1
           WHERE l.cx < 8),
         hs AS (
           SELECT doc_id,
             sum(CASE WHEN cy < 4 THEN
               bit * (CAST(1 AS BIGINT) << (31 - (cy*8 + cx)))
               ELSE 0 END) AS hi,
             sum(CASE WHEN cy >= 4 THEN
               bit * (CAST(1 AS BIGINT) << (31 - ((cy-4)*8 + cx)))
               ELSE 0 END) AS lo
           FROM bits GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
             AS INT) AS hamming
         FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         ORDER BY id_a, id_b""",
    // closed-form hash replay: window means reduce to the seed-mixed
    // envelope multipliers, so bit w compares two integer terms; gain
    // cancels — batch hashes equal corpus hashes per id
    "q169_audio_ehash_dedup" -> {
      def mul(w: String): String =
        s"(doc_id + ($w)*($w)*(1 + doc_id % 31) + (doc_id // 7) * ($w)) % 9"
      s"""WITH bits AS (
           SELECT doc_id, w,
             CASE WHEN ${mul("w + 1")} > ${mul("w")}
               THEN 1 ELSE 0 END AS bit
           FROM (SELECT doc_id, unnest(generate_series(0, 63)) AS w
                 FROM documents)),
         hs AS (
           SELECT doc_id,
             sum(CASE WHEN w < 32 THEN
               bit * (CAST(1 AS BIGINT) << (31 - w)) ELSE 0 END) AS hi,
             sum(CASE WHEN w >= 32 THEN
               bit * (CAST(1 AS BIGINT) << (63 - w)) ELSE 0 END) AS lo
           FROM bits GROUP BY doc_id),
         b AS (SELECT doc_id, hi, lo FROM hs WHERE doc_id % 5 = 0)
         SELECT a.doc_id AS corpus_id, b.doc_id AS batch_id,
           CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
             AS INT) AS hamming
         FROM hs a JOIN b ON bit_count(xor(a.hi, b.hi))
           + bit_count(xor(a.lo, b.lo)) <= 3
         ORDER BY corpus_id, batch_id"""
    },
    "q30_binary_fingerprints" ->
      """SELECT doc_id,
         'application/octet-stream' AS mime,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         md5(text) AS fingerprint,
         CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) AS n_chunks
         FROM documents ORDER BY doc_id""",
    // q38: the oracle recomputes the header fields straight from the
    // doc_id formulas — Spark must round-trip them through actual PNG
    // header bytes (hex-assemble → unhex → parse), so an encode or
    // decode defect on either side breaks the match.
    "q38_png_header_decode" ->
      """SELECT doc_id,
         'png' AS format,
         CAST(doc_id % 64 + 16 AS BIGINT) AS width,
         CAST(doc_id % 48 + 8 AS BIGINT) AS height,
         CAST(8 AS INT) AS bit_depth,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                   WHEN doc_id % 3 = 1 THEN 3
                   ELSE 4 END AS INT) AS channels
         FROM documents ORDER BY doc_id""",
    // q256: same deal as q38 — the oracle recomputes the fields from
    // the doc_id formulas; Spark must round-trip them through actual
    // JPEG bytes INCLUDING the variable-length COM segment the SOF
    // walk has to step over
    "q256_jpeg_header_decode" ->
      """SELECT doc_id,
         'jpeg' AS format,
         CAST(doc_id % 64 + 16 AS BIGINT) AS width,
         CAST(doc_id % 48 + 8 AS BIGINT) AS height,
         CAST(8 AS INT) AS bit_depth,
         CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 3 END AS INT)
           AS channels
         FROM documents ORDER BY doc_id""",
    // q270: the walk must recover the synthesis formulas from REAL
    // JDK-encoder bytes; bit_depth 8 / channels 3 are the baseline
    // RGB encoder's fixed SOF0 fields
    "q270_jpeg_real_roundtrip" ->
      """SELECT doc_id,
         'jpeg' AS format,
         CAST(doc_id % 24 + 8 AS BIGINT) AS width,
         CAST(doc_id % 16 + 8 AS BIGINT) AS height,
         CAST(8 AS INT) AS bit_depth,
         CAST(3 AS INT) AS channels
         FROM documents ORDER BY doc_id""",
    // q39: DuckDB has no image codec, but it doesn't need one — the
    // synthetic PNG's pixel (x,y) is fixed arithmetic of (x,y,seed)
    // (Multimodal.syntheticPng), so the oracle reconstructs the channel
    // sums in closed form: r = x*7+seed and b = x+y+5*seed never wrap
    // at these dims (≤216, ≤82 < 256); g = (y*11+3*seed) % 256 can wrap
    // → summed per-y via a list comprehension. The REAL cast replays
    // the decoder's double→float truncation bit-for-bit.
    "q39_image_pixel_stats" ->
      """WITH p AS (
           SELECT doc_id,
             CAST(doc_id % 24 + 8 AS INT) AS width,
             CAST(doc_id % 16 + 8 AS INT) AS height,
             doc_id % 7 AS seed
           FROM documents),
         s AS (
           SELECT doc_id, width, height,
             height * (7 * width * (width-1) // 2 + width * seed)
               AS sum_r,
             width * list_sum([ (y*11 + 3*seed) % 256
               FOR y IN range(0, CAST(height AS BIGINT)) ]) AS sum_g,
             width * height * 5 * seed + height * (width*(width-1) // 2)
               + width * (height*(height-1) // 2) AS sum_b
           FROM p)
         SELECT doc_id, width, height,
           round(CAST(CAST(CAST(sum_r AS DOUBLE) / (width*height) / 255.0
             AS REAL) AS DOUBLE), 4) AS mean_r,
           round(CAST(CAST(CAST(sum_g AS DOUBLE) / (width*height) / 255.0
             AS REAL) AS DOUBLE), 4) AS mean_g,
           round(CAST(CAST(CAST(sum_b AS DOUBLE) / (width*height) / 255.0
             AS REAL) AS DOUBLE), 4) AS mean_b
         FROM s ORDER BY doc_id""",
    // analytic roundtrip: the synthesized square wave's RMS and peak
    // are exactly its amplitude, so the oracle needs no audio codec
    "q47_wav_roundtrip" ->
      """SELECT doc_id,
         CAST(1 AS INT) AS channels,
         CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
         CAST(400 + (doc_id % 5) * 200 AS BIGINT) AS n_samples,
         CAST(1000 + (doc_id % 20) * 1500 AS INT) AS peak,
         CAST(1000 + (doc_id % 20) * 1500 AS DOUBLE) AS rms
         FROM documents ORDER BY doc_id""",
    "q63_video_meta" ->
      """WITH v AS (
           SELECT doc_id,
             CAST(doc_id % 3 * 300 + 600 AS BIGINT) AS timescale,
             CAST((doc_id % 50 + 1) * 600 AS BIGINT) AS duration_ticks
           FROM documents),
         d AS (
           SELECT *, CAST(duration_ticks AS DOUBLE) / timescale AS dur
           FROM v)
         SELECT doc_id, 'mp4' AS format, 'isom' AS brand,
           timescale, duration_ticks,
           round(dur, 4) AS duration_sec,
           CAST(8 AS INT) AS n_frames,
           round(dur * 1 / 16.0, 4) AS first_ts,
           round(dur * 15 / 16.0, 4) AS last_ts
         FROM d ORDER BY doc_id""",
    // closed form of the STREAMINFO builder's doc_id arithmetic —
    // the hash proves the two-half 36-bit reassembly (the every-5th
    // plant crosses 2^32) and the 16-byte MD5 hex read
    "q343_flac_header_decode" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'flac' END
             AS format,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 4096 END
             AS BIGINT) AS min_blocksize,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 4096 END
             AS BIGINT) AS max_blocksize,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id % 100 + 14 END AS BIGINT) AS min_framesize,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id % 1000 + 500 END AS BIGINT) AS max_framesize,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE (doc_id % 12 + 1) * 4000 END AS BIGINT)
             AS sample_rate,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id % 2 + 1 END AS INT) AS channels,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE (doc_id % 3) * 4 + 8 END AS INT) AS bits_per_sample,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id * 1000 + 7 + CASE WHEN doc_id % 5 = 0
               THEN 12884901888 ELSE 0 END END AS BIGINT)
             AS total_samples,
           CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE lower(repeat(lpad(to_hex(
               (doc_id * 2654435761) % 4294967296), 8, '0'), 4)) END
             AS md5_hex
         FROM documents ORDER BY doc_id""",
    // closed form of the ustar builder's doc_id arithmetic — the
    // hash proves the ASCII-octal conv walk and the 512-block
    // entry_bytes planner number
    "q344_tar_header_decode" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'tar' END
             AS format,
           CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 'f' || CAST(doc_id AS VARCHAR) || '.txt' END
             AS name,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 384 + doc_id % 64 END AS BIGINT) AS mode,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id % 1000 END AS BIGINT) AS uid,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE (doc_id * 3) % 1000 END AS BIGINT) AS gid,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id * 3 + 5 END AS BIGINT) AS size,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 1700000000 + doc_id END AS BIGINT) AS mtime,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE (doc_id * 7) % 262144 END AS BIGINT) AS checksum,
           CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 10 = 0 THEN '5' ELSE '0' END AS typeflag,
           CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 'u' || CAST(doc_id % 10 AS VARCHAR) END AS uname,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 512 + ((doc_id * 3 + 5 + 511) // 512) * 512 END
             AS BIGINT) AS entry_bytes
         FROM documents ORDER BY doc_id""",
    // closed form of the frame builder's doc_id arithmetic carrying
    // the same MPEG-1 Layer III literal tables; frame_bytes is the
    // same mirrored double floor-division on both engines
    "q345_mp3_frame_decode" ->
      """WITH p AS (
           SELECT doc_id,
             CASE doc_id % 14 + 1
               WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
               WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
               WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
               WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
               WHEN 13 THEN 256 ELSE 320 END AS br,
             CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
               ELSE 32000 END AS sr,
             doc_id % 2 AS pad, doc_id % 4 AS md
           FROM documents)
         SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'mp3' END
             AS format,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE br END
             AS BIGINT) AS bitrate_kbps,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE sr END
             AS BIGINT) AS sample_rate,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE pad END
             AS INT) AS padding,
           CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN md = 0 THEN 'stereo' WHEN md = 1 THEN 'joint_stereo'
             WHEN md = 2 THEN 'dual_channel' ELSE 'mono' END
             AS channel_mode,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE CAST(floor(CAST(144 * br * 1000 AS DOUBLE)
               / CAST(sr AS DOUBLE)) AS BIGINT) + pad END AS BIGINT)
             AS frame_bytes
         FROM p ORDER BY doc_id""",
    // closed form of the record builder's id arithmetic; header_len
    // is the builder's own length arithmetic (111 + value lengths,
    // +2 for the blank-line offset)
    "q356_warc_meta" ->
      """WITH p AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'response'
               WHEN doc_id % 3 = 1 THEN 'request'
               ELSE 'metadata' END AS wtype,
             'https://site' || CAST(doc_id % 50 AS VARCHAR)
               || '.com/page' || CAST(doc_id AS VARCHAR) AS uri,
             '2024-03-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2,
               '0') || 'T12:00:00Z' AS wdate,
             CAST(doc_id * 7 + 100 AS VARCHAR) AS clen,
             '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '>' AS rid
           FROM documents)
         SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'warc' END
             AS format,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE '1.0' END
             AS version,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE wtype END
             AS warc_type,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE uri END
             AS target_uri,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE wdate END
             AS warc_date,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE doc_id * 7 + 100 END AS BIGINT) AS content_length,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE rid END
             AS record_id,
           CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE 113 + len(wtype) + len(uri) + len(clen) + len(rid)
             END AS BIGINT) AS header_len
         FROM p ORDER BY doc_id""",
    // closed form of the shell builder's id arithmetic; every 13th
    // id is a PDF missing its %%EOF (has_eof 0, format null), every
    // 17th not a PDF at all (all-null)
    "q357_pdf_shell" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0 THEN NULL
             ELSE 'pdf' END AS format,
           CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0 THEN NULL
             ELSE '1.' || CAST(doc_id % 8 AS VARCHAR) END AS version,
           CAST(CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0
             THEN NULL ELSE doc_id * 3 + 9 END AS BIGINT)
             AS startxref,
           CAST(CASE WHEN doc_id % 17 = 0 THEN NULL
             WHEN doc_id % 13 = 0 THEN 0 ELSE 1 END AS INT)
             AS has_eof,
           CAST(CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0
             THEN NULL
             ELSE 26 + (doc_id % 50 + 40)
               + len(CAST(doc_id * 3 + 9 AS VARCHAR)) END AS BIGINT)
             AS bytes
         FROM documents ORDER BY doc_id""",
    // closed form of the ISO-BMFF builder's id arithmetic; every
    // 13th id truncates mid-ispe (dims null, identity intact),
    // every 17th is an isom brand (not this family, all-null)
    "q365_avif_header_decode" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 17 = 0 THEN NULL
             WHEN doc_id % 10 = 0 THEN 'heif' ELSE 'avif' END
             AS format,
           CASE WHEN doc_id % 17 = 0 THEN NULL
             WHEN doc_id % 10 = 0 THEN 'heic' ELSE 'avif' END
             AS brand,
           CAST(CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0
             THEN NULL ELSE 100 + doc_id % 900 END AS BIGINT)
             AS width,
           CAST(CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0
             THEN NULL ELSE 50 + (doc_id * 3) % 700 END AS BIGINT)
             AS height
         FROM documents ORDER BY doc_id""",
  )

  /** Audio codec roundtrip: synthesize a REAL PCM16 WAV per document
    * (square wave parameterized by doc_id), decode it back through the
    * batch PCM parser, and emit signal stats. Every sample of a square
    * wave is ±amplitude, so decoded RMS and peak both equal the
    * amplitude EXACTLY — the oracle recomputes them analytically from
    * doc_id without any audio stack.
    */
  private[graft] def wavRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val wavs = Multimodal.synthesizeTestWavs(
      docs(s, dir).select("doc_id"), "doc_id")
    Multimodal.decodeWavStats(wavs, "id", "wav")
      .select(col("id").as("doc_id"), col("channels"), col("sample_rate"),
        col("n_samples"), col("peak"), round(col("rms"), 4).as("rms"))
      .orderBy("doc_id")
  }

  /** MP4 metadata roundtrip (the q38 pattern for VIDEO): a synthetic
    * ISO-BMFF header per doc_id — 20-byte ftyp(isom) + moov + mvhd v0
    * with formula-driven timescale/duration — is ENCODED as hex and
    * DECODED back by [[Multimodal.videoHeaderMeta]] (dynamic box
    * offsets, pure expressions), then frame-sample midpoint
    * timestamps are planned from the decoded duration. The oracle
    * computes the same formulas directly, so any encode OR decode bug
    * breaks the hash match.
    */
  private[graft] def videoMeta(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val timescale = (id % 3 * 300 + 600).cast("long")
    val ticks = ((id % 50 + 1) * 600).cast("long")
    val headerHex = concat(
      lit("00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D"),
      lit("00000074" + "6D6F6F76"), // moov size + type
      lit("0000006C" + "6D766864" + "00" + "000000" // mvhd v0 + flags
        + "00000000" + "00000000"), // creation + modification
      lpad(hex(timescale), 8, "0"), lpad(hex(ticks), 8, "0"))
    val n = 8
    docs(s, dir)
      .select(id, Multimodal.videoHeaderMeta(unhex(headerHex)).as("m"))
      .select(id, col("m.format").as("format"), col("m.brand").as("brand"),
        col("m.timescale").as("timescale"),
        col("m.duration_ticks").as("duration_ticks"),
        round(col("m.duration_sec"), 4).as("duration_sec"),
        Multimodal.frameSampleTimestamps(col("m.duration_sec"), n)
          .as("__ts"))
      .select(col("doc_id"), col("format"), col("brand"),
        col("timescale"), col("duration_ticks"), col("duration_sec"),
        size(col("__ts")).as("n_frames"),
        element_at(col("__ts"), 1).as("first_ts"),
        element_at(col("__ts"), n).as("last_ts"))
      .orderBy("doc_id")
  }

  /** Multimodal plumbing over binary payloads (text bytes here; the
    * same path carries image/audio blobs).
    */
  private[graft] def binaryFingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("bin"))
      .select(
        col("doc_id"),
        Multimodal.sniffMime(col("bin")).as("mime"),
        length(col("bin")).cast("long").as("byte_len"),
        md5(col("bin")).as("fingerprint"),
        Multimodal.chunkCount(col("bin"), 256).as("n_chunks"))
      .orderBy("doc_id")

  /** Multimodal header decode, end-to-end through real bytes: PNG
    * headers are BUILT from doc_id formulas as pure column expressions
    * (hex-assemble + unhex), then DECODED back by
    * [[Multimodal.imageHeaderMeta]] — also pure expressions, all
    * whole-stage codegen. The oracle computes the same formulas
    * directly, so any encode OR decode bug breaks the hash match.
    */
  private[graft] def pngHeaderDecode(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val w = (id % 64 + 16).cast("long")
    val h = (id % 48 + 8).cast("long")
    val colorType = when(id % 3 === 0, 0)
      .when(id % 3 === 1, 2).otherwise(6)
    val headerHex = concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"), // sig + IHDR
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
      lit("08"), lpad(hex(colorType), 2, "0"), lit("000000"))
    docs(s, dir)
      .select(id, unhex(headerHex).as("__bin"))
      .select(id, Multimodal.imageHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.bit_depth").as("bit_depth"),
        col("m.channels").as("channels"))
      .orderBy("doc_id")
  }

  /** JPEG twin of [[pngHeaderDecode]] — but where PNG dims sit at a
    * FIXED offset, the JPEG SOF frame header sits after a
    * data-dependent prefix, so this exercises the
    * [[Multimodal.jpegSofScan]] segment walk: each doc's synthetic
    * header carries a COM segment whose length varies with doc_id
    * (0–10 padding bytes), the SOF marker alternates baseline
    * C0 / progressive C2, and channels alternate 3 / 1. Headers are
    * BUILT from doc_id formulas as pure column expressions
    * (hex-assemble + unhex) and DECODED back by the walk; the oracle
    * computes the formulas directly, so an encode OR walk bug — e.g.
    * mis-stepping the variable-length segment — breaks the hash.
    */
  private[graft] def jpegHeaderDecode(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val w = (id % 64 + 16).cast("long")
    val h = (id % 48 + 8).cast("long")
    val ncomp = when(id % 5 === 0, 1).otherwise(3)
    val pad = (id % 11).cast("int")
    val sofMarker = when(id % 2 === 0, lit("C0")).otherwise(lit("C2"))
    val headerHex = concat(
      // SOI + APP0/JFIF (16-byte segment, standard payload)
      lit("FFD8" + "FFE00010" + "4A46494600010100000100010000"),
      // COM segment: variable-length padding ('x' × (id % 11))
      lit("FFFE"), lpad(hex(pad + 2), 4, "0"), repeat(lit("78"), pad),
      // SOF: len = 8 + 3·ncomp, precision 8, height, width, ncomp,
      // then ncomp×3 component-spec filler bytes
      lit("FF"), sofMarker, lpad(hex(lit(8) + ncomp * 3), 4, "0"),
      lit("08"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
      lpad(hex(ncomp), 2, "0"), repeat(lit("001100"), ncomp))
    docs(s, dir)
      .select(id, unhex(headerHex).as("__bin"))
      .select(id, Multimodal.imageHeaderMeta(col("__bin")).as("m"))
      .select(id, col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.bit_depth").as("bit_depth"),
        col("m.channels").as("channels"))
      .orderBy("doc_id")
  }

  /** The q256 walk against REAL encoder bytes: synthesize an actual
    * JPEG per doc_id (JDK encoder — JFIF APP0, quant/Huffman tables,
    * baseline SOF0, entropy scan), then read its dimensions back with
    * [[Multimodal.imageHeaderMeta]]'s SOF marker walk. q256 proved the
    * walk on hand-assembled headers with adversarial variable-length
    * segments; this proves it on the byte layout a real crawl corpus
    * carries. The oracle recomputes the dimension formulas directly —
    * a walk mis-step over any real segment breaks the hash.
    */
  private[graft] def jpegRealRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val jpgs = Multimodal.synthesizeTestJpegs(
      docs(s, dir).select("doc_id"), "doc_id")
    jpgs.select(col("id").as("doc_id"),
        Multimodal.imageHeaderMeta(col("png")).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.bit_depth").as("bit_depth"),
        col("m.channels").as("channels"))
      .orderBy("doc_id")
  }

  /** REAL codec roundtrip at table scale: synthesize a PNG per doc_id
    * (JDK encoder), decode it back with the batched pixel decoder, and
    * emit dims + mean channel stats. The synthetic pixels are
    * closed-form in (x, y, seed), so the oracle reconstructs the
    * channel means analytically (the q47 square-wave treatment) — no
    * image codec needed on the DuckDB side.
    */
  private[graft] def imagePixelStats(s: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal.synthesizeTestImages(
      docs(s, dir).select("doc_id"), "doc_id")
    Multimodal.decodeImageFeatures(imgs, "id", "png", grid = 2)
      .select(col("id").as("doc_id"),
        col("width"), col("height"),
        round(element_at(col("features"), 5).cast("double"), 4)
          .as("mean_r"),
        round(element_at(col("features"), 6).cast("double"), 4)
          .as("mean_g"),
        round(element_at(col("features"), 7).cast("double"), 4)
          .as("mean_b"))
      .orderBy("doc_id")
  }

  /** Image perceptual near-dup ([[Multimodal.imageDHash]] +
    * [[Dedup.hammingBandedPairs]]): 64-bit dHash over a 9×8
    * integer-pooled luma grid, banded Hamming join at distance ≤ 3 —
    * exact by pigeonhole, so the oracle can score ALL pairs and still
    * match. The multimodal dedup path: re-encoded/resized copies of an
    * image land within a few bits while distinct images scatter.
    * Synthetic TEXTURED images are arithmetic of (x, y, seed) (the q39
    * construction with oscillating formulas), so the whole
    * decode→pool→hash→pair chain replays in SQL with integer
    * exactness (milli-luma sums, cross-multiplied averages); ids
    * agreeing mod 336 are identical images (hamming 0).
    */
  private[graft] def imageDHashPairs(s: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal.synthesizeTexturedImages(
      docs(s, dir).select("doc_id"), "doc_id")
    Dedup.hammingBandedPairs(
        Multimodal.imageDHash(imgs, "id", "png"),
        "id", "dhash_hi", "dhash_lo", maxDist = 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Audio perceptual near-dup ([[Multimodal.audioEHash]] +
    * [[Dedup.hammingBandedMatches]]): synthesized envelope WAVs per
    * document, a batch of every-5th re-synthesized at DOUBLE gain —
    * same recording, different volume — probed against the corpus at
    * Hamming ≤ 3. The hash is exact integer arithmetic end to end
    * (Σ|sample| per window, cross-multiplied mean comparisons), so
    * gain-scaled copies match at Hamming 0 by construction and the
    * whole decode→pool→hash→band chain replays closed-form from the
    * synthesis parameters (the q39/q122 analytic-oracle treatment).
    * Fourth fingerprint family on the shared banded machinery.
    */
  private[graft] def audioEhashDedupQ(s: SparkSession, dir: String): DataFrame = {
    val ids = docs(s, dir).select(col("doc_id"))
    val corpusHash = Multimodal.audioEHash(
      Multimodal.synthesizeEnvelopeWavs(ids, "doc_id", ampScale = 1),
      "id", "wav")
    val batchHash = Multimodal.audioEHash(
      Multimodal.synthesizeEnvelopeWavs(
        ids.where(col("doc_id") % 5 === 0), "doc_id", ampScale = 2),
      "id", "wav")
    Dedup.hammingBandedMatches(
        corpusHash.select(col("id"), col("ahash_hi"), col("ahash_lo")),
        batchHash.select(col("id"), col("ahash_hi"), col("ahash_lo")),
        "id", "ahash_hi", "ahash_lo", maxDist = 3)
      .select(col("corpus_id"), col("batch_id"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("corpus_id", "batch_id")
  }
}
