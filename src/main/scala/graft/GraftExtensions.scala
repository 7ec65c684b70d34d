package graft

import graft.expressions.{BloomMightContain, BloomShard, DamerauLevenshtein, DotProduct, JaroWinkler, UnicodeNormalize, ZOrderKey}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point, installed via
  * `spark.sql.extensions=graft.GraftExtensions`
  * ([[graft.core.Sessions]] sets it).
  *
  * Registers the engine's native Catalyst expressions as SQL functions:
  *   - `graft_dot(array<double>, array<double>) -> double` — codegen'd
  *     vector dot product ([[graft.expressions.DotProduct]]).
  *   - `graft_bloom_contains(binary, string) -> boolean` — codegen'd
  *     Bloom-filter membership probe
  *     ([[graft.expressions.BloomMightContain]]).
  *   - `graft_bloom_shard(string, int) -> int` — codegen'd shard
  *     router for sharded Bloom filters
  *     ([[graft.expressions.BloomShard]]).
  *   - `graft_zorder(int, int) -> bigint` — codegen'd order-preserving
  *     Morton key for Z-order data layout
  *     ([[graft.expressions.ZOrderKey]]).
  *   - `graft_normalize(string, form) -> string` — codegen'd Unicode
  *     normalization (NFC/NFD/NFKC/NFKD)
  *     ([[graft.expressions.UnicodeNormalize]]).
  *   - `graft_jaro_winkler(string, string) -> double` — codegen'd
  *     Jaro–Winkler similarity, bit-compatible with DuckDB's
  *     `jaro_winkler_similarity` ([[graft.expressions.JaroWinkler]]).
  *   - `graft_damerau_levenshtein(string, string) -> int` — codegen'd
  *     unrestricted Damerau–Levenshtein distance, matching DuckDB's
  *     `damerau_levenshtein`
  *     ([[graft.expressions.DamerauLevenshtein]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bloom_contains expects 2 arguments, got ${children.size}")
        BloomMightContain(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_shard"),
      new ExpressionInfo(classOf[BloomShard].getName, "graft_bloom_shard"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bloom_shard expects 2 arguments, got ${children.size}")
        BloomShard(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "graft_zorder"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_zorder expects 2 arguments, got ${children.size}")
        ZOrderKey(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(
        classOf[UnicodeNormalize].getName, "graft_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_normalize expects 2 arguments, got ${children.size}")
        UnicodeNormalize(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_damerau_levenshtein"),
      new ExpressionInfo(
        classOf[DamerauLevenshtein].getName, "graft_damerau_levenshtein"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_damerau_levenshtein expects 2 arguments, " +
            s"got ${children.size}")
        DamerauLevenshtein(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(
        classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_jaro_winkler expects 2 arguments, got ${children.size}")
        JaroWinkler(children.head, children(1))
      }))
  }
}
