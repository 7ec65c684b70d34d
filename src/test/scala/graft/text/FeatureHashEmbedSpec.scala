package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[TextAnalysis.featureHashEmbed]] — the hashing-trick embedder. */
class FeatureHashEmbedSpec extends SparkSpec {

  private val dim = 16

  private def embed(texts: String*): Seq[Seq[Double]] = {
    val schema = StructType(Seq(StructField("text", StringType)))
    df(schema, texts.map(Row(_)))
      .select(TextAnalysis.featureHashEmbed(col("text"), dim).as("v"))
      .collect().map(_.getSeq[Double](0)).toSeq
  }

  /** Driver replay of the bucket formula: first 8 md5 hex chars as a
    * long, mod dim.
    */
  private def bucket(token: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % dim).toInt
  }

  test("vector equals the driver replay: exact bucket counts") {
    val text = "the quick brown fox jumps over the lazy dog the"
    val toks = text.split(" ").toSeq
    val want = (0 until dim).map(j =>
      toks.count(t => bucket(t) == j).toDouble)
    assert(embed(text).head === want)
  }

  test("component sum is the token count; repeats accumulate") {
    val Seq(a, b) = embed("alpha beta gamma", "alpha alpha beta")
    assert(a.sum === 3.0)
    assert(b.sum === 3.0)
    assert(b(bucket("alpha")) === 2.0)
  }

  test("empty and non-alnum text embeds to the zero vector") {
    val Seq(v) = embed("!!! ???")
    assert(v === Seq.fill(dim)(0.0))
  }

  test("tokenization matches words(): case folds, punctuation splits") {
    assert(embed("Alpha, BETA!").head === embed("alpha beta").head)
  }

  test("dim bounds are enforced") {
    intercept[IllegalArgumentException] {
      TextAnalysis.featureHashEmbed(col("text"), 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.featureHashEmbed(col("text"), 2048)
    }
  }
}
