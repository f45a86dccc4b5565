package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode text normalization: canonical form (NFC/NFKC/NFD/NFKD)
  * plus optional diacritic stripping — the standard first step of corpus
  * cleaning (fold visually-identical byte sequences together before
  * hashing/dedup, so `café` composed and decomposed dedup as one document).
  *
  * A UDF would do this interpreted with per-row boxing; this expression
  * stays inside whole-stage codegen as a single static call (codegen'd
  * callers pay no reflection), ASCII fast-path included — ASCII text (the
  * overwhelming majority of a web corpus) returns the input UTF8String
  * without any copy or JDK normalizer call.
  */
case class NormalizeText(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val formOk = second.foldable && second.dataType == StringType
    val stripOk = third.foldable && third.dataType == BooleanType
    if (first.dataType == StringType && formOk && stripOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, form literal, boolean literal)")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = first.nullable

  override def nullSafeEval(s: Any, form: Any, strip: Any): Any =
    NormalizeText.norm(s.asInstanceOf[UTF8String],
      form.asInstanceOf[UTF8String], strip.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f, st) =>
      s"graft.expressions.NormalizeText.norm($s, $f, $st)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NormalizeText =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "ww_normalize_text"
}

object NormalizeText {

  /** Static kernel shared by interpreted eval and generated code. */
  def norm(s: UTF8String, form: UTF8String, stripAccents: Boolean): UTF8String = {
    // ASCII fast path: all normalization forms are identity on ASCII and
    // there are no diacritics to strip — return the input, zero copies
    if (isAscii(s)) return s
    val f = form.toString.toUpperCase match {
      case "NFC" => Normalizer.Form.NFC
      case "NFD" => Normalizer.Form.NFD
      case "NFKC" => Normalizer.Form.NFKC
      case "NFKD" => Normalizer.Form.NFKD
      case other =>
        throw new IllegalArgumentException(s"unknown Unicode form: $other")
    }
    val out =
      if (!stripAccents) Normalizer.normalize(s.toString, f)
      else {
        // decompose, drop combining marks, recompose to the target form
        val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(decomposed.length)
        var i = 0
        while (i < decomposed.length) {
          val c = decomposed.charAt(i)
          if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
          i += 1
        }
        Normalizer.normalize(sb.toString, f)
      }
    UTF8String.fromString(out)
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
