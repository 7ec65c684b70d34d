package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AudioEHashSpec extends SparkSpec {

  private def wavs(rows: Seq[(Long, Array[Byte])]) = df(
    StructType(Seq(
      StructField("id", LongType),
      StructField("wav", BinaryType))),
    rows.map { case (i, b) => Row(i, b) })

  private def hashOf(rows: Seq[(Long, Array[Byte])]) =
    Multimodal.audioEHash(wavs(rows), "id", "wav")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toMap

  test("energies: exact integer window sums, closed-form from the " +
      "envelope synthesis") {
    val n = 413
    val bytes = Multimodal.envelopeWav(8000, n, 300, seed = 7L)
    val prof = Multimodal.wavWindowEnergies(wavs(Seq(1L -> bytes)),
        "id", "wav")
      .collect()(0)
    assert(prof.getLong(1) === n.toLong)
    val es = prof.getSeq[Long](2)
    val cs = prof.getSeq[Long](3)
    assert(cs.sum === n.toLong)
    // every sample in window w has |s| = 300 * (1 + mul(seed, w)):
    // the window sum is exactly count * amplitude
    val expected = (0 until 65).map { w =>
      val cnt = ((w + 1).toLong * n + 64) / 65 - (w.toLong * n + 64) / 65
      cnt * (300L * (1 + Multimodal.envelopeMul(7L, w)))
    }
    assert(es.toSeq === expected)
  }

  test("volume invariance: doubling the gain leaves the hash " +
      "identical; a different seed changes it") {
    val a1 = Multimodal.envelopeWav(8000, 450, 300, seed = 42L)
    val a2 = Multimodal.envelopeWav(8000, 450, 600, seed = 42L)
    val b = Multimodal.envelopeWav(8000, 450, 300, seed = 43L)
    val h = hashOf(Seq(1L -> a1, 2L -> a2, 3L -> b))
    assert(h(1L).get === h(2L).get)
    assert(h(1L).get !== h(3L).get)
  }

  test("undecodable payloads yield null hashes, not failures") {
    val h = hashOf(Seq(
      1L -> "not a wav".getBytes("UTF-8"),
      2L -> Multimodal.envelopeWav(8000, 400, 300, 1L)))
    assert(h(1L).isEmpty)
    assert(h(2L).isDefined)
  }

  test("banded matches catch the gain-scaled copy at hamming 0") {
    import graft.dedup.Dedup
    val corpus = Multimodal.audioEHash(wavs((1L to 20L).map(i =>
      i -> Multimodal.envelopeWav(8000, 400 + i.toInt, 300, i))),
      "id", "wav")
    val batch = Multimodal.audioEHash(wavs(Seq(
      7L -> Multimodal.envelopeWav(8000, 407, 900, 7L))), "id", "wav")
    val m = Dedup.hammingBandedMatches(
        corpus.select("id", "ahash_hi", "ahash_lo"),
        batch.select("id", "ahash_hi", "ahash_lo"),
        "id", "ahash_hi", "ahash_lo", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m.contains((7L, 7L)))
  }
}
