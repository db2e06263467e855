package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C4-style line filtering in ONE pass (Raffel et al. 2020, §2.2 of the
  * T5 paper): split a page on newlines and keep only lines that (a) end
  * in a terminal punctuation mark (`.` `!` `?` `"`), (b) contain at least
  * `minWords` whitespace-separated words, and (c) do not contain any of
  * the `banned` substrings case-insensitively (C4 uses "javascript").
  * Returns the kept lines, trimmed, as `array<string>`; page-level rules
  * (minimum retained lines, "lorem ipsum", `{`) live in
  * [[graft.ops.LineClean]] as plain column predicates.
  *
  * Why an expression: the rules need a per-line trim + word count +
  * lowercase-contains, which as `filter(split(text, '\n'), line -> ...)`
  * would run three interpreted lambda passes per LINE (the
  * [[ChunkText]] trap); here the page is scanned once in codegen.
  *
  * Cross-engine contract: lines split on `\n` only; the trim/word
  * whitespace set is `{space, \t, \f, \r}` — RE2's `\s` minus `\n` — so
  * a SQL oracle reproduces word counts with `string_split_regex(t,
  * '\s+')` after the same trim.
  */
case class CleanLines(child: Expression, minWords: Int, banned: Seq[String])
    extends UnaryExpression {
  require(minWords >= 1, s"minWords must be >= 1, got $minWords")

  @transient private lazy val bannedLower: Array[String] =
    banned.map(_.toLowerCase).toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "clean_lines"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"clean_lines requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CleanLines.compute(input.toString, minWords, bannedLower)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bannedRef = ctx.addReferenceObj("banned", bannedLower, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CleanLines.compute($c.toString(), $minWords, $bannedRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): CleanLines =
    copy(child = newChild)
}

object CleanLines {

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\f' || ch == '\r'

  private def isTerminal(ch: Char): Boolean =
    ch == '.' || ch == '!' || ch == '?' || ch == '"'

  def compute(text: String, minWords: Int, bannedLower: Array[String]): Array[UTF8String] = {
    val lines = text.split("\n", -1)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](lines.length)
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      var a = 0
      var b = raw.length
      while (a < b && isWs(raw.charAt(a))) a += 1
      while (b > a && isWs(raw.charAt(b - 1))) b -= 1
      if (b > a && isTerminal(raw.charAt(b - 1))) {
        var words = 0
        var inWord = false
        var j = a
        while (j < b) {
          if (isWs(raw.charAt(j))) inWord = false
          else if (!inWord) { words += 1; inWord = true }
          j += 1
        }
        if (words >= minWords) {
          val t = raw.substring(a, b)
          val lower = t.toLowerCase
          var bad = false
          var k = 0
          while (k < bannedLower.length && !bad) {
            if (lower.contains(bannedLower(k))) bad = true
            k += 1
          }
          if (!bad) out += UTF8String.fromString(t)
        }
      }
      i += 1
    }
    out.toArray
  }

  def apply(c: Column, minWords: Int, banned: Seq[String]): Column =
    GraftSql.column(CleanLines(GraftSql.expression(c), minWords, banned))
}
