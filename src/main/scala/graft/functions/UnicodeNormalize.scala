package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for training-data pipelines: NFC
  * normalization (composed form — 'e'+U+0301 becomes 'é', so visually
  * identical strings hash/dedup identically), Unicode-aware lowercasing,
  * and whitespace collapse (all Unicode whitespace runs → one space,
  * trimmed) — the standard pre-tokenization cleanup before dedup hashing,
  * language ID, or shingle extraction.
  *
  * Native Catalyst expression with codegen: one JVM call per row inside
  * whole-stage codegen, no UDF serialization. The fast path skips the NFC
  * pass entirely for pure-ASCII rows (`Normalizer.isNormalized` is O(n)
  * with an ASCII short-circuit), which at corpus scale is the overwhelming
  * majority of rows.
  */
case class UnicodeNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def compute(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    // collapse ALL Unicode whitespace (incl. NBSP U+00A0, ideographic
    // space U+3000) to single ASCII spaces, trimmed
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var pendingSpace = false
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      if (Character.isWhitespace(cp) || Character.getType(cp) == Character.SPACE_SEPARATOR) {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column = GraftSql.column(UnicodeNormalize(GraftSql.expression(c)))
}
