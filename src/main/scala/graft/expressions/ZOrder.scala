package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) key for two 32-bit dimensions, with whole-stage
  * codegen: interleaves the bits of `left` and `right` into one long
  * whose SIGNED ordering equals the Z-curve order of the (left, right)
  * plane.
  *
  * Why an engine primitive: sorting (or range-partitioning) a table by
  * this key clusters rows so that BOTH dimensions are locally
  * correlated within every file — parquet min/max zone maps then prune
  * selective predicates on EITHER column, where a lexicographic
  * (a, b) sort only ever prunes on `a`. This is the multi-dimensional
  * data-layout technique behind `OPTIMIZE ZORDER BY` in lakehouse
  * engines, exposed as a pure deterministic expression so it composes
  * with `repartitionByRange`/`sortWithinPartitions` and stays inside
  * codegen (no UDF boundary in the layout job's hot path).
  *
  * Order-correctness details (spec-pinned):
  *   - each input is sign-flipped (`x ^ Int.MinValue`) so the unsigned
  *     bit pattern orders like the signed int (negatives first);
  *   - bits spread by the standard mask-shift doubling, left in odd
  *     positions (major), right in even;
  *   - the final key is sign-flipped back so SIGNED long comparison
  *     matches unsigned Z-curve order.
  *
  * Null inputs produce null (null-intolerant), matching SQL sort
  * semantics (nulls ordered by the sort's null policy, not by a fake
  * key).
  */
case class ZOrderKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two int arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(
      a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrderKey.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.interleave($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Spread the low 32 bits of `x` into the even bit positions of a
    * long (mask-shift doubling — O(log w) ops, branch-free).
    */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton-interleave two signed ints into an order-preserving signed
    * long (see [[ZOrderKey]] doc for the sign-flip construction).
    */
  def interleave(a: Int, b: Int): Long = {
    val ua = (a ^ Int.MinValue).toLong & 0xFFFFFFFFL
    val ub = (b ^ Int.MinValue).toLong & 0xFFFFFFFFL
    ((spread(ua) << 1) | spread(ub)) ^ Long.MinValue
  }
}
