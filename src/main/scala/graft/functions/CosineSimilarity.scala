package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd cosine similarity over two `array<double>` columns: one tight
  * loop computing dot product and both norms.
  *
  * The `aggregate(zip_with(...))` composition is semantically identical but
  * runs as INTERPRETED higher-order functions (lambda call + array alloc
  * per element) — ~20x slower per pair, which dominates every ANN scoring
  * stage. Accumulation is sequential in index order and the result is
  * `dot / (sqrt(na) * sqrt(nb))` — bit-identical to the previous
  * expression path and to DuckDB's list_cosine_similarity, keeping the
  * oracle hash-match intact.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity requires (array<double>, array<double>), got $other")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSimilarity.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def compute(a: ArrayData, b: ArrayData): Double = {
    // dimension mismatch = malformed input: return 0.0 (never ranks first)
    // instead of a partial cosine over the shared prefix, which can be
    // ~1.0 and surface corrupt vectors as everyone's nearest neighbor —
    // the same rank-malformed-last convention as NearestCentroids/LshBuckets
    if (a.numElements() != b.numElements()) return 0.0
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm guard: 0/0 = NaN would sort ABOVE every real cosine in a
    // descending top-k (Spark orders NaN greater than any double), so an
    // all-zero embedding would silently become everyone's rank-1 neighbor
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def apply(a: Column, b: Column): Column =
    GraftSql.column(CosineSimilarity(GraftSql.expression(a), GraftSql.expression(b)))
}
