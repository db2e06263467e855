package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping token-window chunk texts in ONE pass: normalize → tokenize →
  * emit each `chunkSize`-token window (advancing by `stride`) as a
  * space-joined string, directly as `array<string>`.
  *
  * Why an expression and not `transform(sequence(...), i => slice(tokens,
  * ...))`: a higher-order function re-evaluates every expression inside its
  * lambda PER ELEMENT, so the tokenize pipeline would run once per chunk
  * instead of once per document (measured 4-20x on the documents corpus —
  * the same trap [[HashedShingles]] closes for MinHash shingles).
  * Tokenization is byte-identical to `TextFunctions.tokens` /
  * [[HashedShingles.tokenize]], so chunk contents line up with every other
  * token-based operator and the SQL oracle.
  *
  * Chunk count follows the covering rule: 0 windows for an empty token
  * stream, 1 when `n <= chunkSize`, else `ceil((n - chunkSize) / stride) +
  * 1`; the last window may be shorter (truncated, never padded).
  */
case class ChunkText(child: Expression, chunkSize: Int, stride: Int)
    extends UnaryExpression {
  require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
    s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_text"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"chunk_text requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ChunkText.compute(input.toString, chunkSize, stride)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ChunkText.compute($c.toString(), $chunkSize, $stride))")

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
}

object ChunkText {

  def compute(text: String, chunkSize: Int, stride: Int): Array[UTF8String] = {
    val toks = HashedShingles.tokenize(text)
    val n = toks.length
    if (n == 0) return Array.empty
    val nChunks = if (n <= chunkSize) 1 else (n - chunkSize + stride - 1) / stride + 1
    val out = new Array[UTF8String](nChunks)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nChunks) {
      val start = i * stride
      val end = math.min(start + chunkSize, n)
      sb.setLength(0)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  def apply(c: Column, chunkSize: Int, stride: Int): Column =
    GraftSql.column(ChunkText(GraftSql.expression(c), chunkSize, stride))
}
