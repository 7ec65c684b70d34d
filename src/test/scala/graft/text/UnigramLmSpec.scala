package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[UnigramLm]] — seed counts, the integer-lexicographic Viterbi
  * (checked against brute-force segmentation enumeration), hard-EM
  * usage re-estimation, coverage invariants, and the production
  * apply's equality with the trainer's segmentation.
  */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  private val L = 3 // maxPieceLen in these tests

  /** All segmentations of w into pieces of length ≤ maxLen. */
  private def segmentations(w: String, maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      segmentations(w.drop(l), maxLen).map(w.take(l) +: _)
    }

  /** Brute-force optimum of the packed objective (k·2^40 − Σq) over
    * segmentations whose every piece scores (unk single chars score
    * 0). Returns the minimal objective value.
    */
  private def bruteBest(w: String, q: Map[String, Long]): Long =
    segmentations(w, L).flatMap { seg =>
      val scores = seg.map(p =>
        q.get(p).orElse(if (p.length == 1) Some(0L) else None))
      if (scores.forall(_.isDefined))
        Some(seg.length * (1L << 40) - scores.map(_.get).sum)
      else None
    }.min

  test("viterbiLen matches brute-force enumeration on every word of " +
      "a random-ish vocabulary") {
    val q = Map("ab" -> 300000L, "abc" -> 150000L, "a" -> 100000L,
      "b" -> 90000L, "c" -> 80000L, "bc" -> 200000L, "cab" -> 10L)
    for (w <- Seq("abc", "abcabc", "cabbc", "aaa", "b", "abcbcab",
        "ccc", "ababab")) {
      val got = UnigramLm.viterbiLen(w, q, L, 16)
      val wantK = (bruteBest(w, q) + (1L << 40) - 1) >> 40
      assert(got === wantK, s"word $w")
    }
  }

  test("unknown chars segment as unk tokens; long words fall back to " +
      "chars") {
    val q = Map("a" -> 1L)
    assert(UnigramLm.viterbiLen("axa", q, L, 16) === 3L)
    assert(UnigramLm.viterbiLen("a" * 20, q, L, 16) === 20L)
    assert(UnigramLm.viterbiLen("", q, L, 16) === 0L)
  }

  test("seedVocab counts substring positions weighted by word " +
      "frequency; single chars survive minCount") {
    // corpus: "aba aba ab" → wf: aba×2, ab×1
    val df = Seq("aba aba ab").toDF("text")
    val wf = UnigramLm.wordFreq(df, "text", 16)
    val seed = UnigramLm.seedVocab(wf, L, minCount = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // positions: in "aba": a×2, b×1, ab, ba, aba; in "ab": a, b, ab
    assert(seed("a") === 5L) // 2·2 + 1
    assert(seed("b") === 3L) // 2·1 + 1
    assert(seed("ab") === 3L) // 2 + 1
    // "ba"(2) and "aba"(2) fall below minCount=3 and are multi-char
    assert(!seed.contains("ba") && !seed.contains("aba"))
  }

  test("emRound's re-estimated counts equal per-word Viterbi counts " +
      "via the production apply (trainer/apply agreement)") {
    val df = Seq("the cat sat on the mat", "a cat on a mat",
      "the the cat").toDF("text")
    val wf = UnigramLm.wordFreq(df, "text", 16)
    val seed = UnigramLm.seedVocab(wf, L, minCount = 2)
    val scored = UnigramLm.scores(seed)
    val counts = UnigramLm.emRound(wf, scored, L)
    // Σ piece usage == Σ word freq × token count under the same scores
    val totalPieces = counts.agg(sum("cnt")).head.getLong(0)
    val q = scored.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val wfRows = wf.collect().map(r => (r.getString(0), r.getLong(1)))
    val want = wfRows.map { case (w, f) =>
      f * UnigramLm.viterbiLen(w, q, L, 16)
    }.sum
    assert(totalPieces === want)
    // coverage: every single char of the corpus is present
    val pieces = counts.select("piece").as[String].collect().toSet
    wfRows.flatMap(_._1.toSeq).map(_.toString).toSet
      .foreach((c: String) => assert(pieces.contains(c), s"char $c"))
  }

  test("train returns a ranked vocab, deterministic ties, and prunes " +
      "unused multi-char pieces") {
    val df = Seq("banana bandana banana", "banana band").toDF("text")
    val v = UnigramLm.train(df, "text", vocabSize = 10, iters = 2,
      maxPieceLen = L, maxWordLen = 16, minCount = 2)
    val rows = v.orderBy("rank").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    // ranks dense from 1; ordering (cnt desc, piece asc)
    assert(rows.map(_.getInt(3)).toSeq === (1 to rows.length))
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sortBy { case (c, p) => (-c, p) }.toSeq === pairs.toSeq)
    // rerun is deterministic
    val v2 = UnigramLm.train(df, "text", vocabSize = 10, iters = 2,
      maxPieceLen = L, maxWordLen = 16, minCount = 2)
    assert(v2.orderBy("rank").collect().toSeq === rows.toSeq)
  }

  test("tokenCounts over documents: null text and empty words " +
      "survive with zeros") {
    val df = Seq((1L, "aa bb"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val q = Map("aa" -> 500000L, "a" -> 1L, "b" -> 1L)
    val out = UnigramLm.tokenCounts(df, "doc_id", "text", q, L, 16)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 2L && out(0).getLong(2) === 3L) // aa + b,b
    assert(out(1).getLong(1) === 0L && out(1).getLong(2) === 0L)
    assert(out(2).getLong(1) === 0L && out(2).getLong(2) === 0L)
  }
}
