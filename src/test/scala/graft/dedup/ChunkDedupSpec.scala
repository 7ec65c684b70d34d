package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chunk-level incremental dedup ([[Dedup.dedupChunksAgainst]]):
  * content-defined chunking composed with the dedup-against-store
  * anti-join, so an edited snapshot re-ships deltas, not documents.
  */
class ChunkDedupSpec extends SparkSpec {

  private def docs(rows: (Int, String)*) = df(
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("text", StringType, nullable = true))),
    rows.map { case (i, t) => Row(i, t) })

  private def tokens(seed: Int, n: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map(_ => s"w${rng.nextInt(80)}")
  }

  test("an edited document re-lands ONLY the chunks touching its " +
      "edit; untouched documents and untouched chunks dedup away " +
      "entirely") {
    val t1 = tokens(1, 400)
    val t2 = tokens(2, 400)
    val t3 = tokens(3, 400)
    val prev = docs(
      (1, t1.mkString(" ")), (2, t2.mkString(" ")), (3, t3.mkString(" ")))
    // mid-document insertion in doc 2 only
    val t2edited = t2.take(200) ++
      Seq("inserted", "sentence", "goes", "here") ++ t2.drop(200)
    val snap = docs(
      (1, t1.mkString(" ")), (2, t2edited.mkString(" ")),
      (3, t3.mkString(" ")))
    val out = graft.dedup.Dedup.dedupChunksAgainst(
        prev, snap, "id", "text", k = 3, targetTokens = 16)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(3)))
    assert(out.nonEmpty, "the edit must land at least one new chunk")
    assert(out.forall(_._1 == 2),
      s"untouched documents re-landed chunks: ${out.map(_._1).toSet}")
    // only the chunks AROUND the edit re-land, not doc 2's whole tail
    val doc2Chunks = graft.text.TextAnalysis.chunkByContent(
        snap.where(col("id") === 2), "id", "text", 3, 16)
      .count()
    assert(out.length.toLong * 2 < doc2Chunks,
      s"${out.length} of $doc2Chunks chunks re-landed — boundaries " +
        "shifted past the edit")
    // exactness: the store ∪ survivors covers the snapshot's chunk
    // set, and every survivor is genuinely absent from the store
    def md5s(d: org.apache.spark.sql.DataFrame) =
      graft.text.TextAnalysis.chunkByContent(d, "id", "text", 3, 16)
        .select(md5(col("chunk_text"))).collect()
        .map(_.getString(0)).toSet
    val store = md5s(prev)
    val snapSet = md5s(snap)
    val survivors = out.map(c =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(c._3.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).toSet
    assert(survivors.intersect(store).isEmpty)
    assert(snapSet.subsetOf(store ++ survivors))
  }

  test("within-snapshot collapse: identical chunk texts across " +
      "documents land once, first writer (lowest id, chunk_idx) wins") {
    val shared = tokens(7, 120).mkString(" ")
    val prev = docs((1, tokens(9, 150).mkString(" ")))
    val snap = docs((5, shared), (6, shared))
    val out = graft.dedup.Dedup.dedupChunksAgainst(
        prev, snap, "id", "text", k = 3, targetTokens = 16)
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.nonEmpty)
    assert(out.forall(_._1 == 5),
      s"duplicate chunks must land once under the first writer: " +
        out.mkString(", "))
  }
}
