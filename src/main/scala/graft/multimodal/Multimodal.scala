package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batch-shaped over partitions.
  *
  * The Spark-side plumbing here — schemas, magic-byte sniffing,
  * chunking, partition-batched feature extraction — is real and tested.
  * The DECODE step is a clearly-marked deterministic STUB
  * ([[stubDecodeFeatures]]): this container has no image/audio codecs,
  * so it derives fake-but-stable features from the bytes; swapping in a
  * real decoder changes one function, not the pipeline shape.
  *
  * Scale notes: binary payloads stay columnar in Parquet (no row-blowup
  * until an explicit chunk/explode); feature extraction is
  * embarrassingly parallel mapPartitions with batch iteration, the
  * Scala analogue of `mapInPandas` batch UDFs — amortizes per-batch
  * model setup without a Python boundary.
  */
object Multimodal {

  /** Metadata struct carried next to every binary payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("fingerprint", StringType)))

  /** Sniff a payload's mime type from magic bytes (hex of the first 4
    * bytes) — pure column expression, no decode.
    */
  def sniffMime(bin: Column): Column = {
    val magic = upper(hex(substring(bin, 1, 4)))
    when(magic.startsWith("89504E47"), "image/png")
      .when(magic.startsWith("FFD8FF"), "image/jpeg")
      .when(magic.startsWith("47494638"), "image/gif")
      .when(magic.startsWith("52494646"), "audio/wav") // RIFF container
      .when(magic.startsWith("664C6143"), "audio/flac")
      .when(magic.startsWith("00000018") || magic.startsWith("00000020"),
        "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Content fingerprint + size + sniffed mime as a metadata struct. */
  def mediaMeta(bin: Column): Column = struct(
    sniffMime(bin).as("mime"),
    length(bin).cast("long").as("byte_len"),
    md5(bin).as("fingerprint"))

  /** Attach metadata columns for a binary payload column. */
  def withBinaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("mime", sniffMime(col(binCol)))
      .withColumn("byte_len", length(col(binCol)).cast("long"))
      .withColumn("fingerprint", md5(col(binCol)))

  /** Number of fixed-size chunks a payload splits into. */
  def chunkCount(bin: Column, chunkSize: Int): Column =
    ceil(length(bin).cast("double") / lit(chunkSize.toDouble)).cast("int")

  /** Explode a payload into (chunk_idx, chunk) rows of `chunkSize`
    * bytes — the shard shape for parallel decode of huge payloads
    * (frame-sampling video, windowed audio). Row count multiplies by
    * ceil(len/chunkSize): make the explode explicit, never implicit.
    */
  def chunkBinary(
      df: DataFrame, idCol: String, binCol: String,
      chunkSize: Int): DataFrame =
    df.select(col(idCol),
      posexplode(split_binary(col(binCol), chunkSize)).as(
        Seq("chunk_idx", "chunk")))

  private def split_binary(bin: Column, chunkSize: Int): Column = {
    val n = chunkCount(bin, chunkSize)
    // sequence(0, -1) yields a DESCENDING [0, -1] in Spark — an empty
    // payload must produce an empty chunk array, not phantom chunks
    when(n <= 0, array().cast("array<binary>"))
      .otherwise(transform(
        sequence(lit(0), n - 1),
        i => substring(bin, i * chunkSize + 1, lit(chunkSize))))
  }

  /** Feature-extraction output schema: id + fixed-width float vector. */
  def featureSchema(idType: DataType, dim: Int): StructType = StructType(Seq(
    StructField("id", idType),
    StructField("features", ArrayType(FloatType))))

  /** STUB decoder ???: a real implementation would decode the payload
    * (image resize / audio resample / video frame-sample) and run a
    * feature extractor per BATCH. This stub derives `dim` deterministic
    * pseudo-features from the payload's md5 so the pipeline shape —
    * partition-parallel, batch-iterated, fixed-width float output — is
    * real and testable without codecs.
    */
  def stubDecodeFeatures(
      df: DataFrame, idCol: String, binCol: String,
      dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val session = df.sparkSession
    val idType = df.schema(idCol).dataType
    val outSchema = featureSchema(idType, dim)
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // batch iteration: real decoders amortize model/codec setup per
      // batch exactly here (the mapInPandas batch shape)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.get(binIdx) match {
            case b: Array[Byte] => b
            case null => Array.empty[Byte]
          }
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes)
          val feats = (0 until dim).map { i =>
            // ??? STUB: stands in for decoded pixel/sample statistics
            (digest(i % digest.length) & 0xff).toFloat / 255f
          }.toArray
          Row(r.get(idIdx), feats)
        }
      }
    }
    session.createDataFrame(rdd, outSchema)
  }
}
