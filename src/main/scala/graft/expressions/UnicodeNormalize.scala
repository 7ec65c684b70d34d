package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (`graft_normalize(str, form)`) as a native
  * codegen'd expression — NFC/NFD/NFKC/NFKD via `java.text.Normalizer`
  * (the JDK's implementation of UAX #15, the same algorithm DuckDB's
  * `nfc_normalize` implements, so results are oracle-comparable
  * byte-for-byte).
  *
  * Why an engine primitive: canonical equivalence is the FIRST step of
  * every text-dedup and fingerprint pipeline over web-scraped corpora
  * — "café" composed (U+00E9) and decomposed (`e` + U+0301) are the
  * same text but different byte strings, so md5/minhash/simhash keys
  * split and near-dup recall silently drops. Normalizing inside
  * whole-stage codegen keeps the canonicalization in the scan's fused
  * loop (a Scala UDF here would box every row and break the codegen
  * span right at the start of the pipeline, where all 100 TB flow).
  *
  * The `form` argument must fold to one of NFC/NFD/NFKC/NFKD
  * (checked at analysis, not per row). The fast path: `Normalizer
  * .isNormalized` is O(n) with no allocation for already-normal text —
  * the overwhelming case in real corpora — so the quick-check cost, not
  * the recomposition cost, is what scales.
  */
case class UnicodeNormalize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    if (!right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be a literal")
    val f = right.eval(null)
    if (f == null || !UnicodeNormalize.forms.contains(f.toString))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of " +
          UnicodeNormalize.forms.keys.toSeq.sorted.mkString(", "))
    TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(s: Any, f: Any): Any =
    UnicodeNormalize.normalize(
      s.asInstanceOf[UTF8String], f.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, f) => {
      val cls = UnicodeNormalize.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.normalize($s, $f);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(left = newLeft, right = newRight)
}

object UnicodeNormalize {

  private[expressions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  /** Row-path entry (interpreted AND codegen'd). The form lookup is a
    * 4-entry map hit; `isNormalized` short-circuits the already-normal
    * case with zero allocation.
    */
  def normalize(s: UTF8String, form: UTF8String): UTF8String = {
    val f = forms(form.toString)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
