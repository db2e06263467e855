package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** ALL sign-LSH table buckets of an `array<double>` vector in ONE pass:
  * element `t` of the result is the `planes(t).length`-bit bucket id of the
  * vector in hash table `t` (bit j = sign of the dot with plane j).
  *
  * Exists so multi-table OR-amplified LSH needs ONE corpus scan: the
  * earlier formulation built a separate `scan → bucket → join` branch per
  * table and unioned them — `tables` full corpus scans at 100 TB. Callers
  * `posexplode` this array to (table, bucket) rows instead: same rows, one
  * scan, one join. The plane tensor rides along as a codegen reference
  * object (one plan node at any tables x nPlanes), and each dot accumulates
  * sequentially in index order — bit-identical bucket ids to the previous
  * per-table `aggregate(zip_with(...)) > 0` path.
  *
  * Malformed vectors (dimension mismatch with a plane, null element) get
  * bucket -1 in every table — a value no well-formed `nPlanes <= 31` bucket
  * can take; callers filter those rows out before the candidate join so
  * malformed vectors match nothing, not each other (the analogue of
  * [[NearestCentroids]]' Infinity ranking).
  */
case class LshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.forall(t => t.nonEmpty && t.length <= 31),
    "each table needs 1..31 planes (bucket packed into an int)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets requires array<double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBuckets.compute($c, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  def compute(v: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val tables = planes.length
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      val tp = planes(t)
      var bucket = 0
      var j = 0
      while (j < tp.length && bucket != -1) {
        val p = tp(j)
        if (v.numElements() != p.length) bucket = -1
        else {
          var d = 0.0
          var i = 0
          var nullSeen = false
          while (i < p.length && !nullSeen) {
            if (v.isNullAt(i)) nullSeen = true
            else d += v.getDouble(i) * p(i)
            i += 1
          }
          if (nullSeen) bucket = -1
          else if (d > 0) bucket |= 1 << j
        }
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, planes: Array[Array[Array[Double]]]): Column =
    GraftSql.column(LshBuckets(GraftSql.expression(c), planes))
}
