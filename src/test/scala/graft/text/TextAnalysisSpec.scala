package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TextAnalysisSpec extends SparkSpec {

  private def textDf(texts: String*) = df(
    StructType(Seq(StructField("text", StringType))),
    texts.map(Row(_)))

  private def one(text: String, c: org.apache.spark.sql.Column) =
    textDf(text).select(c).head()

  private def idTextDf(rows: (Int, String)*) = df(
    StructType(Seq(
      StructField("id", IntegerType), StructField("text", StringType))),
    rows.map { case (i, t) => Row(i, t) })

  test("chunkByTokens: overlapping windows cover every token, last " +
      "chunk may be short, empty docs emit nothing") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = idTextDf((1, ten), (2, "only three words"), (3, "  "), (4, null))
    val out = TextAnalysis.chunkByTokens(d, "id", "text",
        window = 4, overlap = 1)
      .orderBy("id", "chunk_idx")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // stride 3; T=10 → chunk starts 0,3,6: [w1..w4][w4..w7][w7..w10]
    assert(out.toSeq == Seq(
      (1, 0, 4, "w1 w2 w3 w4"),
      (1, 1, 4, "w4 w5 w6 w7"),
      (1, 2, 4, "w7 w8 w9 w10"),
      (2, 0, 3, "only three words"))) // T < window → one short chunk
  }

  test("chunkByTokens: a straddling tail emits a short final chunk " +
      "and every token appears in at least one chunk") {
    val eleven = (1 to 11).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.chunkByTokens(
        idTextDf((1, eleven)), "id", "text", window = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.length == 4)
    assert(out.last == (3, 2, "t10 t11")) // short tail
    val covered = out.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 11).map(i => s"t$i").toSet)
  }

  test("chunkByContent: chunks partition the token stream exactly " +
      "(concatenation reconstructs the document), short and empty " +
      "docs handled") {
    val rng = new scala.util.Random(13)
    val long = (1 to 400).map(_ => s"tok${rng.nextInt(50)}").mkString(" ")
    val d = idTextDf((1, long), (2, "just two"), (3, ""), (4, null))
    val out = TextAnalysis.chunkByContent(d, "id", "text",
        k = 3, targetTokens = 16)
      .orderBy("id", "chunk_idx").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val doc1 = out.filter(_._1 == 1)
    assert(doc1.length > 5, s"expected many ~16-token chunks")
    assert(doc1.map(_._4).mkString(" ") == long.toLowerCase)
    assert(doc1.map(_._3).sum == 400L)
    doc1.foreach { case (_, _, nt, txt) =>
      assert(nt == txt.split(" ").length)
    }
    // a doc shorter than k is one whole chunk; empty/null docs absent
    assert(out.filter(_._1 == 2).toSeq == Seq((2, 0, 2L, "just two")))
    assert(!out.exists(r => r._1 == 3 || r._1 == 4))
  }

  test("chunkByContent is insertion-robust: editing the middle of a " +
      "document changes only the chunks around the edit — fixed " +
      "windows shift every later chunk") {
    val rng = new scala.util.Random(29)
    val tokens = (1 to 600).map(_ => s"w${rng.nextInt(80)}")
    val orig = tokens.mkString(" ")
    val edited = (tokens.take(300) ++ Seq("inserted", "sentence",
      "goes", "here") ++ tokens.drop(300)).mkString(" ")
    def md5s(text: String, byContent: Boolean) = {
      val d = idTextDf((1, text))
      val c =
        if (byContent) TextAnalysis.chunkByContent(d, "id", "text",
          k = 3, targetTokens = 16)
        else TextAnalysis.chunkByTokens(d, "id", "text", window = 16)
      c.select(md5(col("chunk_text"))).collect().map(_.getString(0)).toSeq
    }
    val cdcShared =
      (md5s(orig, true).toSet & md5s(edited, true).toSet).size.toDouble /
        md5s(orig, true).size
    val fixShared =
      (md5s(orig, false).toSet & md5s(edited, false).toSet).size.toDouble /
        md5s(orig, false).size
    assert(cdcShared > 0.8,
      s"content-defined chunks should survive a mid-doc edit: $cdcShared")
    assert(fixShared < 0.6,
      s"fixed windows should shift after the edit: $fixShared")
  }

  test("repetitionSignals: repeated bigrams raise dup/top fractions, " +
      "unique text scores 0, sub-2-token docs are absent") {
    val d = idTextDf(
      (1, "spam spam spam spam spam"), // one bigram repeated 4×
      (2, "all words here are fully distinct tokens"),
      (3, "one"), // no bigrams
      (4, "ab cd ab cd ab")) // "ab cd"×2, "cd ab"×2
    val out = TextAnalysis.repetitionSignals(d, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1, 2, 4))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1) == ((1, 4L, 0.75, 1.0))) // 4 occurrences, 1 distinct
    assert(m(2)._3 == 0.0) // no duplication
    assert(m(4)._2 == 4L && m(4)._3 == 0.5 && m(4)._4 == 0.5)
  }

  test("chunkByTokens rejects overlap >= window") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(idTextDf((1, "a b")), "id", "text", 4, 4)
    }
  }

  test("tfidf: corpus-wide terms score below doc-distinctive terms; " +
      "smooth idf floors at 1 per occurrence") {
    val d = df(
      StructType(Seq(
        StructField("id", IntegerType), StructField("text", StringType))),
      Seq(
        org.apache.spark.sql.Row(1, "common word apple"),
        org.apache.spark.sql.Row(2, "common word banana"),
        org.apache.spark.sql.Row(3, "common word cherry")))
    val out = TfIdf.tfidf(d, "id", "text")
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getAs[Long]("df"), r.getAs[Double]("tfidf"))).toSeq
    val apple = out.find(r => r._2 == "apple").get
    val common = out.find(r => r._1 == 1 && r._2 == "common").get
    assert(apple._3 == 1L && common._3 == 3L)
    assert(apple._4 > common._4) // distinctive beats corpus-wide
    // smooth idf: ln((3+1)/(1+1)) + 1 for a df=1 token with tf=1
    assert(math.abs(apple._4 - (math.log(2.0) + 1.0)) < 1e-12)
  }

  test("normalizeText lowercases, strips symbols, collapses whitespace, " +
      "keeps unicode letters") {
    assert(one("  Héllo,   WORLD!!\t(42) ",
      TextAnalysis.normalizeText(col("text"))).getString(0) ==
      "héllo world 42")
    assert(one("中文 文本。", TextAnalysis.normalizeText(col("text")))
      .getString(0) == "中文 文本")
  }

  test("redactPii replaces emails, SSNs, and phone numbers with typed " +
      "placeholders; piiCount counts them") {
    val in = "Mail a.b+c@ex-1.org or call 555.123.4567; ssn 123-45-6789."
    val red = one(in, TextAnalysis.redactPii(col("text"))).getString(0)
    assert(red == "Mail <EMAIL> or call <PHONE>; ssn <SSN>.")
    assert(one(in,
      TextAnalysis.piiCount(TextAnalysis.redactPii(col("text"))))
      .getInt(0) == 3)
  }

  test("redactPii leaves clean text untouched, and an SSN is never " +
      "half-eaten by the phone pattern") {
    val clean = "no pii here, just 12-34 numbers 12345"
    assert(one(clean, TextAnalysis.redactPii(col("text")))
      .getString(0) == clean)
    assert(one("123-45-6789", TextAnalysis.redactPii(col("text")))
      .getString(0) == "<SSN>")
  }

  test("bigrams emits adjacent word pairs, empty under two tokens") {
    assert(one("The quick brown fox", TextAnalysis.bigrams(col("text")))
      .getSeq[String](0) == Seq("the quick", "quick brown", "brown fox"))
    assert(one("single", TextAnalysis.bigrams(col("text")))
      .getSeq[String](0).isEmpty)
    assert(one("", TextAnalysis.bigrams(col("text")))
      .getSeq[String](0).isEmpty)
  }

  test("words lowercases and extracts alphanumeric runs") {
    val r = one("Hello, World! 42 times", TextAnalysis.words(col("text")))
    assert(r.getSeq[String](0) == Seq("hello", "world", "42", "times"))
  }

  test("tokenCount counts words") {
    assert(one("one two three", TextAnalysis.tokenCount(col("text")))
      .getInt(0) == 3)
  }

  test("roughTokens keeps punctuation as separate tokens") {
    val r = one("Hi, there!", TextAnalysis.roughTokens(col("text")))
    assert(r.getSeq[String](0) == Seq("hi", ",", "there", "!"))
  }

  test("punctRatio measures symbol density") {
    val r = one("ab!?", TextAnalysis.punctRatio(col("text"))).getDouble(0)
    assert(r == 0.5)
  }

  test("stopwordRatio measures stopword density") {
    val r = one("the cat sat on the mat",
      TextAnalysis.stopwordRatio(col("text"))).getDouble(0)
    assert(math.abs(r - 3.0 / 6.0) < 1e-9) // the, on, the
  }

  test("qualityScore is in [0,1] and rewards clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and then " +
      "it runs far away into the quiet green forest to rest for a while"
    val noisy = "!!! ??? ### $$$ %%%"
    val qc = one(clean, TextAnalysis.qualityScore(col("text"))).getDouble(0)
    val qn = one(noisy, TextAnalysis.qualityScore(col("text"))).getDouble(0)
    assert(qc > qn)
    assert(qc >= 0.0 && qc <= 1.0 && qn >= 0.0 && qn <= 1.0)
  }

  test("langId identifies marker-bearing languages") {
    val cases = Seq(
      "the cat is on the mat and it is happy" -> "en",
      "der hund ist nicht mit der katze und das ist gut" -> "de",
      "le chat est dans la maison et les chiens aussi" -> "fr",
      "el perro que duerme en la casa y los gatos" -> "es",
      "这是一个中文句子" -> "zh",
      "xyzzy qwerty plugh" -> "unknown")
    cases.foreach { case (text, expected) =>
      assert(one(text, TextAnalysis.langId(col("text"))).getString(0)
        == expected, s"for: $text")
    }
  }

  test("fingerprint is invariant to case and whitespace") {
    val a = one("Hello   World", TextAnalysis.fingerprint(col("text")))
    val b = one("hello world", TextAnalysis.fingerprint(col("text")))
    val c = one("hello universe", TextAnalysis.fingerprint(col("text")))
    assert(a.getString(0) == b.getString(0))
    assert(a.getString(0) != c.getString(0))
    assert(a.getString(0).length == 32)
  }

  test("shingleArray builds distinct in-order word n-grams") {
    val r = one("a b c d a b c d",
      TextAnalysis.shingleArray(col("text"), 3)).getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("shingleArray of short text is empty") {
    assert(one("a b", TextAnalysis.shingleArray(col("text"), 3))
      .getSeq[String](0).isEmpty)
  }

  test("explodeShingles emits one row per distinct shingle") {
    val d = df(
      StructType(Seq(StructField("id", IntegerType),
        StructField("text", StringType))),
      Seq(Row(1, "a b c d"), Row(2, "x y")))
    val out = TextAnalysis.explodeShingles(d, "id", "text", 3)
    assert(out.count() == 2) // doc 1: "a b c","b c d"; doc 2: none
  }

  test("minShingleHash is deterministic and shingle-order independent") {
    val a = one("one two three four five",
      TextAnalysis.minShingleHash(col("text"), 4)).getString(0)
    val b = one("one two three four five",
      TextAnalysis.minShingleHash(col("text"), 4)).getString(0)
    assert(a == b && a.length == 32)
  }

  test("vocabCoverage ranks by count with alphabetical tie-break and " +
      "accumulates coverage over ALL corpus tokens") {
    val d = textDf("a a b", "b a c")
    // counts: a=3, b=2, c=1; total 6
    val out = TextAnalysis.vocabCoverage(d, "text", k = 2)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, "a", 3L, 0.5),
      (2, "b", 2L, math.rint(5.0 / 6.0 * 1e6) / 1e6)))
  }

  test("vocabCoverage: k past the vocabulary returns the whole curve " +
      "ending at 1.0") {
    val out = TextAnalysis.vocabCoverage(textDf("x y x"), "text", 10)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.last.getDouble(3) == 1.0)
  }

  test("unigramLm: closed-form Lidstone probabilities on a tiny " +
      "corpus, constant unseen mass") {
    // corpus tokens: a a b | c  ->  N=4, V=3
    val lm = TextAnalysis.unigramLm(
      idTextDf((1, "a a b"), (2, "c")), "text", alpha = 0.5)
      .orderBy("word").collect()
    val denom = 4.0 + 0.5 * 4
    assert(lm.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(lm(0).getAs[Double]("logp") == math.log(2.5 / denom))
    assert(lm(1).getAs[Double]("logp") == math.log(1.5 / denom))
    assert(lm.forall(
      _.getAs[Double]("unseen_logp") == math.log(0.5 / denom)))
  }

  test("unigramLmScore: weighted mean log-prob per doc, OOV tokens " +
      "take the unseen mass, zero-token docs keep n_tokens 0 with a " +
      "null score") {
    val corpus = idTextDf((1, "a a b"), (2, "c"))
    val lm = TextAnalysis.unigramLm(corpus, "text", alpha = 0.5)
    val out = TextAnalysis.unigramLmScore(
      idTextDf((10, "a b"), (11, "a zz"), (12, "  ")),
      "id", "text", lm)
      .orderBy("id").collect()
    val denom = 4.0 + 0.5 * 4
    val pA = math.log(2.5 / denom); val pB = math.log(1.5 / denom)
    val pU = math.log(0.5 / denom)
    assert(out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - (pA + pB) / 2) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - (pA + pU) / 2) < 1e-12,
      "OOV token must score at unseen_logp")
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2))
  }

  test("unigramLmScoreSelf ranks a doc of corpus-typical words above " +
      "one of rare words (the quality-floor ordering)") {
    val common = "the data engine runs the data engine"
    val rows = (1 to 20).map(i => (i, common)) :+
      (21, "zyx qwv unique singleton tokens only") :+
      (22, common)
    val out = TextAnalysis.unigramLmScoreSelf(
      idTextDf(rows: _*), "id", "text")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(22) > out(21),
      s"typical ${out(22)} should beat rare ${out(21)}")
    assert(out(1) == out(22), "identical docs score identically")
  }

  test("datasheetShards/mergeDatasheets: counts add across shards, " +
      "the merged HLL vocabulary equals the one-shard build exactly " +
      "(union of sketches is register-max), and small vocabularies " +
      "estimate exactly") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("src", StringType),
      StructField("text", StringType)))
    val d = df(schema, Seq(
      Row(1, "web", "alpha beta gamma"),
      Row(2, "web", "alpha delta"),
      Row(3, "web", null),
      Row(4, "book", "epsilon epsilon zeta")))
    def merged(shard: org.apache.spark.sql.Column) =
      TextAnalysis.mergeDatasheets(
        TextAnalysis.datasheetShards(d, "id", "text", Seq("src"), shard),
        Seq("src"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val bySplit = merged(col("id") % 2)
    val onePass = merged(org.apache.spark.sql.functions.lit(0))
    assert(bySplit == onePass, "merge tree must not change the result")
    // closed form: web = 3 docs (null text counts), 5 tokens, 4 vocab
    assert(bySplit("web")._1 == 3L && bySplit("web")._2 == 5L)
    assert(bySplit("web")._3 == 4L)
    assert(bySplit("book") == ((1L, 3L, 2L)))
  }

  test("rareTokenSpans pinpoints the garbage span: the window with " +
      "the most corpus-rare tokens, first start on ties, short docs " +
      "score one full span, empty docs survive with nulls") {
    // 'common' appears 8x across docs; the junk tokens once each
    val d = idTextDf(
      (1, "common common common zq1 zq2 zq3 common common"),
      (2, "common common common"),
      (3, "zq9"),
      (4, ""))
    val out = TextAnalysis.rareTokenSpans(d, "id", "text",
        window = 3, maxFreq = 1)
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    // doc 1: window [3,4,5] = zq1 zq2 zq3 → 3 rare
    assert(out(0) == ((1, 8L, Some(3), Some(3L))))
    // doc 2: no rare tokens anywhere → count 0, first window wins ties
    assert(out(1) == ((2, 3L, Some(0), Some(0L))))
    // doc 3: shorter than the window → its single full span
    assert(out(2) == ((3, 1L, Some(0), Some(1L))))
    assert(out(3) == ((4, 0L, None, None)))
  }

  test("bigramLmScoreSelf: closed-form Jelinek-Mercer interpolation " +
      "on a tiny corpus; short docs carry null score") {
    // corpus: "a b a b" ×1 → bigrams (a,b)×2, (b,a)×1; words a×2 b×2
    val d = idTextDf((1, "a b a b"), (2, "x"))
    val out = TextAnalysis.bigramLmScoreSelf(d, "id", "text",
        lambda = 0.75, alpha = 0.5)
      .orderBy("id").collect()
    // unigram: N=5, V=3, denom = 5 + 0.5*4 = 7
    val puB = 2.5 / 7.0; val puA = 2.5 / 7.0
    // bigram ML: (a,b): 2/2 (c(a·)=2); (b,a): 1/1 (c(b·)=1)
    val pAB = 0.75 * 1.0 + 0.25 * puB
    val pBA = 0.75 * 1.0 + 0.25 * puA
    val want = (2 * math.log(pAB) + 1 * math.log(pBA)) / 3
    assert(out(0).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - want) < 1e-12)
    assert(out(1).getLong(1) == 0L && out(1).isNullAt(2))
  }

  test("bigramLmScoreSelf penalizes word-salad: a shuffled doc with " +
      "the SAME unigram mix scores below the typical word order") {
    val typical = "the data engine runs the data engine well"
    val salad = "engine the runs data well engine the data"
    val rows = (1 to 20).map(i => (i, typical)) :+ (21, salad)
    val out = TextAnalysis.bigramLmScoreSelf(
      idTextDf(rows: _*), "id", "text")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(1) > out(21),
      s"typical ${out(1)} should beat salad ${out(21)}")
    // the unigram model alone cannot separate them (same word counts)
    val uni = TextAnalysis.unigramLmScoreSelf(
      idTextDf(rows: _*), "id", "text")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(uni(1) - uni(21)) < 1e-9)
  }
}
