package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word tokenizer: lowercase, non-[a-z0-9] to space, split,
  * drop empties — the same normalization as `TextFunctions.tokens` but one
  * JVM pass instead of regexp_replace + split + filter (measured ~4x on
  * the documents corpus; the regex path stays in `TextFunctions` where
  * DuckDB-oracle parity pins the exact expression tree).
  */
case class TokenizeWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_words"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tokenize_words requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HashedShingles.tokenize(input.toString).map(UTF8String.fromString): Array[Any])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeWords.computeArrayData($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}

object TokenizeWords {
  def computeArrayData(text: String): GenericArrayData =
    new GenericArrayData(
      HashedShingles.tokenize(text).map(UTF8String.fromString): Array[Any])

  def apply(c: Column): Column = GraftSql.column(TokenizeWords(GraftSql.expression(c)))
}
