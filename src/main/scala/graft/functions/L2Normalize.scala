package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd L2 normalization of an `array<double>` embedding — the
  * standard ingest-time prep that turns every later dot product into a
  * cosine (and is step one of matryoshka truncation: normalize → slice
  * the leading dims → renormalize).
  *
  * One tight loop for the norm, one for the division; a
  * `transform(v, x -> x / sqrt(aggregate(v, …)))` composition would
  * re-evaluate the norm aggregate PER ELEMENT (the lambda re-evaluation
  * trap `ChunkText`/`HashedShingles` exist to avoid — measured 13-20x
  * there). The norm is `sqrt(Σ x²)` accumulated in index order and each
  * element is divided by that one double, so DuckDB's
  * `list_transform(v, x -> x / sqrt(list_sum(...)))` reproduces the
  * result bit-for-bit. An all-zero vector normalizes to itself (the
  * 0-cosine convention of [[CosineSimilarity]], never NaN).
  */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"l2_normalize requires array<double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    L2Normalize.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.L2Normalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  def compute(v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    var sq = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); sq += x * x; i += 1 }
    val out = new Array[Double](n)
    if (sq > 0.0) {
      val norm = math.sqrt(sq)
      i = 0
      while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    } // else: all-zero stays all-zero
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = GraftSql.column(L2Normalize(GraftSql.expression(c)))
}
