package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phonetic keys for entity resolution — the blocking move record
  * linkage runs before any pair scoring: map names/words to codes
  * that survive spelling variation, then only compare WITHIN a code
  * block (the SymSpell/LSH bounded-pair discipline with a phonetic
  * key).
  *
  * [[soundexKey]] is SIMPLIFIED American Soundex, implemented from
  * the published table as pure column string ops on BOTH engines
  * (deliberately NOT Spark's built-in `soundex` — the oracle has no
  * counterpart, and bit-identity requires owning every step): letter
  * → digit via one `translate`, adjacent equal codes collapse to one
  * run (so the first letter absorbs same-coded followers — the
  * "Pfister → P236" rule), zeros (vowels + H/W/Y) drop, pad/truncate
  * to LETTER + 3. The classic H/W transparency refinement (codes
  * separated ONLY by h/w still collapse) is intentionally omitted
  * and documented: it needs a second collapse pass for a case that
  * barely occurs in word-like data.
  */
object Phonetic {

  private val letters = "abcdefghijklmnopqrstuvwxyz"
  private val codes = "01230120022455012623010202"

  /** Simplified Soundex of a lowercase alphabetic word column; null
    * for null/empty/non-[a-z] input (callers filter tokens first).
    */
  def soundexKey(word: Column): Column = {
    val cs = translate(word, letters, codes)
    // run-collapse: keep cs[i] only where it differs from cs[i−1]
    val collapsed = concat_ws("",
      transform(sequence(lit(2), greatest(length(cs), lit(2))), i =>
        when(i <= length(cs) &&
            cs.substr(i, lit(1)) =!= cs.substr(i - 1, lit(1)),
          cs.substr(i, lit(1))).otherwise(lit(""))))
    val tail = rpad(substring(regexp_replace(collapsed, "0", ""),
      1, 3), 3, "0")
    when(word.rlike("^[a-z]+$"),
      concat(upper(substring(word, 1, 1)), tail))
  }

  /** Phonetic confusion blocks over a word column: every distinct
    * word keyed by [[soundexKey]], blocks ranked by how many DISTINCT
    * words share the key — the blocks an entity-resolution pass
    * would score pairwise (block sizes bound the pair work, the
    * banded-LSH trade). Emits the sorted member list for the top
    * blocks; `n_occurrences` weights by raw frequency.
    */
  def soundexBlocks(
      df: DataFrame, wordCol: Column, topK: Int = 30): DataFrame = {
    val words = df.select(wordCol.as("__w"))
      .where(col("__w").isNotNull && col("__w").rlike("^[a-z]+$"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__n"))
      .withColumn("soundex", soundexKey(col("__w")))
    words.groupBy("soundex")
      .agg(count(lit(1)).as("n_words"),
        sum(col("__n")).as("n_occurrences"),
        array_join(sort_array(collect_list(col("__w"))), ", ")
          .as("members"))
      .orderBy(col("n_words").desc, col("soundex").asc)
      .limit(topK)
  }
}
