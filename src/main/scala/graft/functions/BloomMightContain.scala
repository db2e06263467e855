package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Scan-side membership test against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over LONG keys.
  *
  * The filter ships to executors as its serialized bytes inside the
  * expression (one copy per task binary, deserialized once per instance via
  * a transient lazy, NOT per row) and evaluates inside whole-stage codegen
  * — no UDF, no shuffle, no broadcast-join machinery. `mightContain` has no
  * false negatives, so `!BloomMightContain(k)` proves absence: the caller
  * can route definite-new rows around an expensive exact join and send only
  * the ~fpp false-positive fraction through it (see
  * [[graft.ops.Dedup.incrementalDedup]]).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires a long key, got $other")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from generated code and from nullSafeEval. */
  def might(key: Long): Boolean = bloom.mightContainLong(key)

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(might(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.might($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  def apply(key: Column, bloom: BloomFilter): Column =
    GraftSql.column(BloomMightContain(GraftSql.expression(key), serialize(bloom)))
}
