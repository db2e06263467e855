package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The `k` nearest centroid indices for an `array<double>` vector, by
  * squared L2 distance with (distance, index) ascending tie-break.
  *
  * The centroid matrix rides along as a codegen REFERENCE OBJECT
  * (`ctx.addReferenceObj`), not as literals: the previous
  * one-`typedlit`-per-centroid formulation built an `nLists`-wide
  * expression tree that blew up analysis and codegen at realistic list
  * counts (>= 1024 at 100 TB scale). Here the plan carries one node
  * regardless of `nLists`, and the argmin-k runs as one tight
  * O(nLists x dim) loop inside whole-stage codegen — the exact shape a
  * broadcast k-means assignment needs. Distance accumulation is sequential
  * in index order, bit-identical to the old `aggregate(zip_with(...))`
  * path, so assignments (and IVF recall) are unchanged.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], k: Int)
    extends UnaryExpression {
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids requires array<double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NearestCentroids.compute(input.asInstanceOf[ArrayData], centroids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroids.compute($c, $cRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {

  /** Partial-selection argmin-k: one pass over the centroids, insertion
    * into a k-slot sorted buffer (k is small — nProbe). Strict `<`
    * comparisons keep earlier (lower-index) centroids ahead on distance
    * ties, matching lexicographic (distance, index) order.
    */
  def compute(v: ArrayData, cents: Array[Array[Double]], k: Int): ArrayData = {
    val n = cents.length
    val kk = math.min(k, n)
    val bestD = new Array[Double](kk)
    val bestC = new Array[Int](kk)
    var filled = 0
    var ci = 0
    while (ci < n) {
      val c = cents(ci)
      // Malformed inputs rank LAST instead of yielding a plausible-looking
      // partial distance: a dimension mismatch or a null vector element gets
      // distance +Infinity (the old aggregate(zip_with) path made these
      // null; Infinity keeps them out of the top-k the same way).
      var d = 0.0
      if (v.numElements() != c.length) d = Double.PositiveInfinity
      else {
        var i = 0
        while (i < c.length && !java.lang.Double.isInfinite(d)) {
          if (v.isNullAt(i)) d = Double.PositiveInfinity
          else { val t = v.getDouble(i) - c(i); d += t * t }
          i += 1
        }
      }
      // NaN distance (corrupt centroid/vector) must rank LAST, as the old
      // array_sort path ordered it; with strict `<` insertion a raw NaN
      // would instead wedge into the buffer and block finite candidates
      if (java.lang.Double.isNaN(d)) d = Double.PositiveInfinity
      if (filled < kk) {
        var p = filled
        while (p > 0 && d < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = d; bestC(p) = ci; filled += 1
      } else if (d < bestD(kk - 1)) {
        var p = kk - 1
        while (p > 0 && d < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = d; bestC(p) = ci
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestC, filled))
  }

  def apply(c: Column, centroids: Array[Array[Double]], k: Int): Column =
    GraftSql.column(NearestCentroids(GraftSql.expression(c), centroids, k))
}
