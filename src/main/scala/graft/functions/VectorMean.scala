package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of `array<double>` vectors — embedding centroids as a
  * single aggregation, exercising the remaining extension surface of the
  * engine: a custom Catalyst AGGREGATE ([[TypedImperativeAggregate]], with
  * partial aggregation and binary buffer serialization), not just scalar
  * expressions.
  *
  * Scale shape: the alternative (`posexplode` + groupBy(key, position) +
  * re-assemble with collect_list/sort) shuffles dim×N scalar ROWS and pays
  * per-row agg overhead dim times per vector; this buffer holds one
  * (count, sums[dim]) per group per task, so the shuffle carries exactly
  * one serialized buffer per (task, group) — the map-side-combine answer
  * for vector aggregation.
  *
  * Determinism note: like every distributed floating-point sum (including
  * avg()), bit-level results depend on addition order; round for
  * cross-engine comparison.
  *
  * Null elements and dimension mismatches throw — a corpus mixing
  * dimensionalities is corrupt, and averaging it silently would produce
  * plausible-looking garbage (same policy as
  * [[NearestCentroids]] post-review).
  */
case class VectorMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMean.Buffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_mean"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_mean requires array<double>, got $other")
    }

  override def createAggregationBuffer(): VectorMean.Buffer = new VectorMean.Buffer(0L, null)

  override def update(buf: VectorMean.Buffer, input: InternalRow): VectorMean.Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Double](n)
    else require(buf.sums.length == n,
      s"vector_mean: dimension mismatch (${buf.sums.length} vs $n)")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "vector_mean: null vector element")
      buf.sums(i) += arr.getDouble(i)
      i += 1
    }
    buf.count += 1
    buf
  }

  override def merge(a: VectorMean.Buffer, b: VectorMean.Buffer): VectorMean.Buffer = {
    if (b.sums == null) return a
    if (a.sums == null) { a.sums = b.sums; a.count = b.count; return a }
    require(a.sums.length == b.sums.length,
      s"vector_mean: dimension mismatch (${a.sums.length} vs ${b.sums.length})")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.count += b.count
    a
  }

  override def eval(buf: VectorMean.Buffer): Any =
    if (buf.count == 0L || buf.sums == null) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: VectorMean.Buffer): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * dim)
    bb.putLong(buf.count).putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val dim = bb.getInt()
    if (dim == 0) new VectorMean.Buffer(count, null)
    else {
      val sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { sums(i) = bb.getDouble(); i += 1 }
      new VectorMean.Buffer(count, sums)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMean =
    copy(child = newChild)
}

object VectorMean {
  final class Buffer(var count: Long, var sums: Array[Double])

  def apply(c: Column): Column =
    GraftSql.column(VectorMean(GraftSql.expression(c)).toAggregateExpression())
}
