package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd squared-L2 distance over two `array<long>` columns: one tight
  * integer loop, exact at any magnitude the sum fits.
  *
  * NO-OVERFLOW PRECONDITION (unchecked, like Java long arithmetic
  * everywhere): the sum of squared per-dimension deltas must fit a
  * signed 64-bit long, i.e. max|Δcoord| <= sqrt(Long.MaxValue / d) ≈
  * 3.0e9/sqrt(d) (d=768: ~1.1e8). The library's quantization convention
  * (unit-scale floats x 1000, [[graft.ops.Pq]]/[[graft.ops.IvfIndex]])
  * sits 4+ orders of magnitude inside that bound. Beyond it the value
  * silently wraps — harmless where the result is only RANKED against
  * equally-wrapped peers, but consumers that PARTITION by distance
  * ([[graft.ops.EpsilonJoin]]'s rings) inherit the precondition as a
  * correctness requirement (documented there).
  *
  * Same rationale as [[CosineSimilarity]]: the `aggregate(zip_with(...))`
  * composition is semantically identical but runs as INTERPRETED
  * higher-order functions (lambda call + array alloc per element) — the
  * dominant cost of a bounded all-pairs ε-graph stage (DBSCAN, exact
  * near-dup). Accumulation is sequential in index order; the result is an
  * exact long, so the DuckDB `list_sum(list_transform(list_zip(...)))`
  * oracle matches bit-for-bit.
  *
  * Dimension mismatch = malformed input: returns Long.MaxValue (never
  * within any ε, never the argmin) — the rank-malformed-last convention.
  */
case class SquaredL2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "squared_l2"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"squared_l2 requires (array<bigint>, array<bigint>), got $other")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      SquaredL2.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SquaredL2.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {
  def compute(a: ArrayData, b: ArrayData): Long = {
    if (a.numElements() != b.numElements()) return Long.MaxValue
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftSql.column(SquaredL2(GraftSql.expression(a), GraftSql.expression(b)))
}
