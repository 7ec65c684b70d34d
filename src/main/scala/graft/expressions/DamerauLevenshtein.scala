package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UNRESTRICTED Damerau–Levenshtein distance
  * (`graft_damerau_levenshtein(a, b)`) as a native codegen'd
  * expression — Spark ships plain `levenshtein` only, which charges
  * a transposition 2 edits; for keyboard-typo-dense keys ("marhta")
  * the adjacent swap IS the single most common error, so DL ≤ k
  * blocks with one unit of slack exactly where edit distance
  * over-counts.
  *
  * This is the FULL Lowrance–Wagner algorithm (transpositions may
  * bridge already-edited material: dl("ca","abc") = 2), NOT the
  * cheaper optimal-string-alignment restriction (OSA gives 3 there)
  * — pinned to match DuckDB 1.0's `damerau_levenshtein`, which is
  * also the unrestricted form, so oracle comparisons are
  * integer-exact with no variant ambiguity. Verified by spec on the
  * canonical disagreement cases and on real part names.
  *
  * O(|a|·|b|) time and memory per pair with a last-seen-position
  * map; comparison is per-UTF-16 unit (identical to code points for
  * BMP text — the [[JaroWinkler]] contract). Null-safe, codegen'd:
  * the verify loop of a blocked ER join stays inside whole-stage
  * codegen.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = DamerauLevenshtein.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.distance($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Static entry shared by the interpreted and codegen paths —
    * the Lowrance–Wagner DP with the `da` last-occurrence map.
    */
  def distance(au: UTF8String, bu: UTF8String): Int = {
    val a = au.toString
    val b = bu.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    // d is (l1+2) x (l2+2), with the -1 sentinel row/column at inf
    val d = Array.ofDim[Int](l1 + 2, l2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= l1) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= l2) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v
        }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) {
          db = j; 0
        } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(l1 + 1)(l2 + 1)
  }
}
