package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle hashes in one pass: normalize → tokenize → hash each
  * n-token window, emitting `array<long>` directly.
  *
  * Semantics mirror `TextFunctions.shingles(c, n)` + `xxhash64(shingle)`
  * (same normalization, same "whole text when shorter than n words" rule,
  * xxhash64 seed 42 over the UTF-8 shingle bytes) — but as a single
  * codegen expression: no intermediate Catalyst string arrays, no risk of
  * CollapseProject duplicating the tokenize pipeline. This is the hot
  * input of MinHash dedup, which at 100 TB runs once per document.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_shingles requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HashedShingles.compute(input.toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashedShingles.compute($c.toString(), $n))")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

object HashedShingles {

  /** Same tokenization as TextFunctions.tokens: lowercase, non-[a-z0-9]
    * to space, whitespace-split, empties dropped.
    */
  def tokenize(text: String): Array[String] = {
    // String.toLowerCase first (not per-char Character.toLowerCase): 1:M
    // Unicode case mappings ('\u0130' -> "i" + combining dot) must match
    // what Spark's lower() produces, or shingle hashes drift from the
    // Catalyst composition this is spec-pinned to.
    val lowered = text.toLowerCase
    val sb = new java.lang.StringBuilder(lowered.length)
    var i = 0
    while (i < lowered.length) {
      val ch = lowered.charAt(i)
      sb.append(if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) ch else ' ')
      i += 1
    }
    sb.toString.split(" ").filter(_.nonEmpty)
  }

  def compute(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    val m = toks.length
    val sb = new java.lang.StringBuilder(64)
    def hashWindow(from: Int, until: Int): Long = {
      sb.setLength(0)
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      // same hash family as SQL xxhash64(shingle): XXH64 over UTF-8, seed 42
      org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(UTF8String.fromString(sb.toString), StringType, 42L)
    }
    if (m <= n) Array(hashWindow(0, m))
    else Array.tabulate(m - n + 1)(i => hashWindow(i, i + n))
  }

  def apply(c: Column, n: Int): Column =
    GraftSql.column(HashedShingles(GraftSql.expression(c), n))
}
