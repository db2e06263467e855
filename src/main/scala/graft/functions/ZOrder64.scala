package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 64-bit Morton (z-order) interleave of two long columns — the
  * multi-dimensional clustering key behind data skipping: sorting a table
  * by `zorder64(a, b)` makes every written file cover a compact rectangle
  * in (a, b) space, so parquet min/max row-group stats become selective
  * for predicates on EITHER column (a single-column sort only helps its
  * own column).
  *
  * Bit spread is the standard mask-shift cascade (public-domain
  * bit-twiddling; same construction as Hacker's Delight §7-2 /
  * graphics-gems Morton codes). Inputs are taken modulo 2^32 (the low 32
  * bits); for an order-preserving sort key both inputs should be
  * non-negative and < 2^31 — map wider domains down first (e.g.
  * `unix_micros(ts) div 3600000000` for an hour index).
  */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorder64 requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder64.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  /** Spread the low 32 bits of x into the even bit positions of a long. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** a's bits at even positions, b's at odd. */
  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def apply(a: Column, b: Column): Column =
    GraftSql.column(ZOrder64(GraftSql.expression(a), GraftSql.expression(b)))
}
