package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Gopher quality-rule NUMERATORS in ONE pass (Rae et al. 2021, Table A1
  * — the document-quality heuristics complementing the repetition family
  * in [[graft.ops.GopherRepetition]]): every fraction the rules threshold
  * is emitted as exact integer counts, so rule verdicts are integer
  * comparisons (`10·symbols <= words`) and a SQL oracle reproduces them
  * with no float discipline.
  *
  * Output is a fixed 8-slot `array<long>` (struct-returning expressions
  * buy nothing here and array codegen is the established
  * [[MinHashSignature]] shape):
  *
  *   0: n_words          whitespace-separated words in the raw text
  *   1: sum_word_len     total word characters (== non-whitespace chars)
  *   2: n_alpha_words    words containing at least one ASCII letter
  *   3: n_hash           '#' characters
  *   4: n_ellipsis       non-overlapping "..." runs (⌊run/3⌋) + '…' chars
  *   5: n_lines          lines non-empty after trim
  *   6: n_bullet_lines   trimmed lines starting with '-', '*' or '•'
  *   7: n_ellipsis_lines trimmed lines ending with "..." or '…'
  *
  * Why an expression: the rules need per-word length/alpha checks and
  * per-line trim/prefix/suffix checks — as `filter(split(...))` lambda
  * chains this would run four interpreted passes per document (the
  * [[ChunkText]] trap); here the page is scanned once in codegen.
  *
  * Cross-engine contract (the [[CleanLines]] conventions): the
  * whitespace set is RE2's `\s` = `{space, \t, \n, \f, \r}` so
  * `string_split_regex(text, '\s+')` reproduces the word split; lines
  * split on `\n` only and trim with the same set minus `\n`; "alpha"
  * is ASCII `[A-Za-z]` (a rule definition, not a locale claim — the
  * stopword rule covers non-Latin scripts' false negatives at the
  * pipeline level where language is known).
  *
  * The stopword rule (≥ 2 of Gopher's 8 stop words present) is NOT in
  * this pass: it lives in the corpus token space
  * (`array_intersect(tokenize_words(text), ...)`, both codegen
  * builtins) so it agrees with every other token-level operator — see
  * [[graft.ops.GopherQuality]].
  */
case class GopherSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_signals"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"gopher_signals requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(GopherSignals.compute(input.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.GopherSignals.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): GopherSignals =
    copy(child = newChild)
}

object GopherSignals {

  // RE2's \s — NOT Java's \v-including set (the CleanLines contract).
  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r'

  private def isBullet(ch: Char): Boolean =
    ch == '-' || ch == '*' || ch == '•'

  def compute(text: String): Array[Long] = {
    val n = text.length
    var nWords = 0L; var sumLen = 0L; var nAlpha = 0L
    var nHash = 0L; var nEll = 0L
    var nLines = 0L; var nBullet = 0L; var nEllLines = 0L

    // words + character counters, one pass
    var i = 0
    var inWord = false
    var wordHasAlpha = false
    var dotRun = 0
    while (i <= n) {
      val ch = if (i < n) text.charAt(i) else ' ' // virtual terminator
      if (ch == '.') dotRun += 1
      else { nEll += dotRun / 3; dotRun = 0 }
      if (isWs(ch)) {
        if (inWord) { nWords += 1; if (wordHasAlpha) nAlpha += 1 }
        inWord = false; wordHasAlpha = false
      } else {
        sumLen += 1
        inWord = true
        if ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')) wordHasAlpha = true
        if (ch == '#') nHash += 1
        if (ch == '…') nEll += 1
      }
      i += 1
    }

    // line stats: split on \n, trim with the ws set minus \n
    var start = 0
    var k = 0
    while (k <= n) {
      if (k == n || text.charAt(k) == '\n') {
        var a = start
        var b = k
        while (a < b && isWs(text.charAt(a))) a += 1
        while (b > a && isWs(text.charAt(b - 1))) b -= 1
        if (b > a) {
          nLines += 1
          if (isBullet(text.charAt(a))) nBullet += 1
          val endsDots = b - a >= 3 &&
            text.charAt(b - 1) == '.' && text.charAt(b - 2) == '.' && text.charAt(b - 3) == '.'
          if (endsDots || text.charAt(b - 1) == '…') nEllLines += 1
        }
        start = k + 1
      }
      k += 1
    }
    Array(nWords, sumLen, nAlpha, nHash, nEll, nLines, nBullet, nEllLines)
  }

  def apply(c: Column): Column = GraftSql.column(GopherSignals(GraftSql.expression(c)))
}
