package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** [[Phonetic.soundexKey]] / [[Phonetic.soundexBlocks]] — published
  * Soundex reference values (simplified variant: H/W code as vowels),
  * spelling-variant collisions, collapse/zero-drop order, and the
  * block ranking.
  */
class PhoneticSpec extends SparkSpec {

  private def keys(words: String*): Map[String, String] = {
    val frame = df(
      StructType(Seq(StructField("w", StringType))),
      words.map(Row(_)))
    frame.select(col("w"), Phonetic.soundexKey(col("w")).as("k"))
      .collect()
      .map(r => r.getAs[String]("w") -> r.getAs[String]("k")).toMap
  }

  test("published reference codes (simplified: no H/W transparency)") {
    val k = keys("robert", "rupert", "tymczak", "pfister", "ashcraft",
      "jackson", "honeyman")
    assert(k("robert") == "R163")
    assert(k("rupert") == "R163")
    assert(k("tymczak") == "T522")
    // pfister: the first letter absorbs the same-coded f
    assert(k("pfister") == "P236")
    // simplified variant: s and c stay separate across the vowel-ish h
    assert(k("ashcraft") == "A226")
    assert(k("jackson") == "J250")
    assert(k("honeyman") == "H555")
  }

  test("spelling variants collide; short words pad with zeros") {
    val k = keys("smith", "smyth", "lee", "o")
    assert(k("smith") == k("smyth"))
    assert(k("smith") == "S530")
    assert(k("lee") == "L000")
    assert(k("o") == "O000")
  }

  test("adjacent same-coded letters collapse but vowel-separated " +
      "repeats survive (collapse BEFORE zero-drop)") {
    val k = keys("bb", "bab")
    assert(k("bb") == "B000")  // run collapses with the first letter
    assert(k("bab") == "B100") // the vowel keeps the second b
  }

  test("non-alphabetic and null words key to null") {
    val frame = df(
      StructType(Seq(StructField("w", StringType))),
      Seq(Row("abc123"), Row(""), Row(null)))
    val out = frame.select(Phonetic.soundexKey(col("w")).as("k"))
      .collect()
    out.foreach(r => assert(r.isNullAt(0)))
  }

  test("blocks group variants and rank by distinct-word count with " +
      "sorted members") {
    val words = Seq("smith", "smyth", "smithe", "robert", "rupert",
      "lonely")
    val frame = df(
      StructType(Seq(StructField("w", StringType))),
      (words ++ words.take(2)).map(Row(_))) // smith/smyth twice
    val out = Phonetic.soundexBlocks(frame, col("w"), topK = 10)
      .collect()
    val top = out(0)
    assert(top.getAs[String]("soundex") == "S530")
    assert(top.getAs[Long]("n_words") == 3L)
    assert(top.getAs[Long]("n_occurrences") == 5L)
    assert(top.getAs[String]("members") == "smith, smithe, smyth")
    assert(out(1).getAs[String]("soundex") == "R163")
    assert(out(1).getAs[Long]("n_words") == 2L)
  }
}
