package graft.text

import graft.SparkSpec
import graft.registry.TextRegistry
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The trainable language classifier (q275): learning on separable
  * data, exact-integer determinism, the floor-division discipline on
  * negative gradients, and the beats-the-marker-heuristic claim on
  * the real corpus split.
  */
class LangClassifierSpec extends SparkSpec {

  private def corpus(rows: (Long, String, String)*) = df(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType))),
    rows.map { case (i, l, t) => Row(i, l, t) })

  test("separable vocabularies are learned perfectly — the classifier " +
      "is a real learner, not a majority-class prior") {
    graft.core.CacheScope.withScope {
      val docs = corpus(
        (1 to 20).map(i => (i.toLong, "en",
          s"alpha beta gamma delta word$i alpha beta")) ++
        (21 to 40).map(i => (i.toLong, "de",
          s"zint yark xoph wumb word$i zint yark")): _*)
      val w = LangClassifier.train(docs, "doc_id", "text", "lang",
        Seq("en", "de"), numBuckets = 64, epochs = 5, lrMilli = 10)
      val out = LangClassifier
        .predict(docs, "doc_id", "text", w, numBuckets = 64)
        .select("lang", "predicted").collect()
      assert(out.forall(r => r.getString(0) == r.getString(1)),
        s"misclassified: ${out.filter(r => r.getString(0) != r.getString(1)).toSeq}")
    }
  }

  test("training is deterministic: two runs over the same data yield " +
      "byte-identical weight tables (the SQL-replay contract)") {
    graft.core.CacheScope.withScope {
      val docs = corpus((1 to 30).map(i =>
        (i.toLong, if (i % 3 == 0) "fr" else "es",
          s"uno dos tres word${i % 7} quatre cinq")): _*)
      def weights() = LangClassifier
        .train(docs, "doc_id", "text", "lang", Seq("es", "fr"),
          numBuckets = 32, epochs = 3, lrMilli = 10)
        .orderBy("lang", "bucket").collect().toSeq
      assert(weights() === weights())
    }
  }

  test("negative gradients floor toward -inf, not toward zero: a " +
      "minority class's bias weight after one epoch is exactly " +
      "floorDiv(g*lr, 1000n)") {
    graft.core.CacheScope.withScope {
      // 1 positive, 3 negative rows; no tokens beyond one shared word
      val docs = corpus(
        (1L, "en", "w"), (2L, "de", "w"), (3L, "de", "w"),
        (4L, "de", "w"))
      val w = LangClassifier.train(docs, "doc_id", "text", "lang",
        Seq("en", "de"), numBuckets = 8, epochs = 1, lrMilli = 10)
        .where(col("lang") === "en" && col("bucket") === -1L)
        .head().getLong(2)
      // z=0 -> sigma=5e8; d = +5e8 (doc 1), -5e8 (docs 2-4);
      // g = -1e9; step = floorDiv(-1e9*10, 4000) = -2500000
      assert(w === Math.floorDiv(-1000000000L * 10L, 4000L))
      assert(w === -2500000L) // floor, not the -2499999 truncation
    }
  }

  test("zero-token rows predict unknown; tied scores break by the " +
      "langId precedence") {
    graft.core.CacheScope.withScope {
      val docs = corpus((1L, "en", "common word"), (2L, "de", ""))
      val w = LangClassifier.train(
        docs.where(col("doc_id") === 1), "doc_id", "text", "lang",
        Seq("en", "de"), numBuckets = 16, epochs = 1, lrMilli = 10)
      val out = LangClassifier
        .predict(docs, "doc_id", "text", w, numBuckets = 16)
        .orderBy("doc_id").select("predicted").collect()
      assert(out(1).getString(0) == "unknown")
    }
  }

  test("on the real corpus split the trained model's total correct " +
      "beats the marker heuristic's (the q275 claim)") {
    graft.core.CacheScope.withScope {
      val rows = TextRegistry
        .langClassifierQ(spark, "/root/testdata/sf0.001").collect()
      val model = rows.map(_.getLong(3)).sum
      val marker = rows.map(_.getLong(4)).sum
      assert(model > marker,
        s"model $model should beat marker $marker on the odd split")
    }
  }

  test("resume == full retrain at every split point (the sequential-" +
      "fold identity q279 relies on)") {
    graft.core.CacheScope.withScope {
      val docs = corpus((1 to 40).map(i =>
        (i.toLong, if (i % 4 == 0) "de" else "en",
          s"foo bar word${i % 5} baz qux")): _*)
      val langs = Seq("en", "de")
      def full(e: Int) = LangClassifier
        .train(docs, "doc_id", "text", "lang", langs,
          numBuckets = 32, epochs = e, lrMilli = 10)
      val want = full(4).orderBy("lang", "bucket").collect().toSeq
      for (split <- 1 to 3) {
        val got = LangClassifier.trainResume(docs, "doc_id", "text",
            "lang", langs, full(split), numBuckets = 32,
            moreEpochs = 4 - split, lrMilli = 10)
          .orderBy("lang", "bucket").collect().toSeq
        assert(got === want, s"resume from epoch $split diverged")
      }
    }
  }
}
