package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSql, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Scan-side membership test against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over LONG keys.
  *
  * The filter ships to executors as a [[Broadcast]] handle — the expression
  * tree (and therefore every serialized task binary) carries only the
  * broadcast id, and each EXECUTOR fetches the filter's blocks once,
  * however many tasks it runs. At the incremental-dedup posture this is
  * the difference between a working plan and a dead one: a corpus-scale
  * filter (1e9+ keys at fpp=0.01 is ~GBs) embedded in the expression would
  * blow past task-serialization limits. The broadcast handle also gives the
  * expression well-defined equality (broadcast id), unlike a raw
  * `Array[Byte]` field whose reference semantics break expression
  * canonicalization/dedup.
  *
  * Evaluation happens inside whole-stage codegen — no UDF, no shuffle, no
  * broadcast-join machinery. `mightContain` has no false negatives, so
  * `!BloomMightContain(k)` proves absence: the caller can route
  * definite-new rows around an expensive exact join and send only the
  * ~fpp false-positive fraction through it (see
  * [[graft.ops.Dedup.incrementalDedup]]).
  */
case class BloomMightContain(child: Expression, bloomBc: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires a long key, got $other")
    }

  // one volatile-read-free local ref per expression instance (per task);
  // the broadcast itself materializes once per executor
  @transient private lazy val bloom: BloomFilter = bloomBc.value

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
  /** Broadcast-handle form — the production path: build/broadcast the
    * filter once, reference it from every batch's plan.
    */
  def apply(key: Column, bloomBc: Broadcast[BloomFilter]): Column =
    GraftSql.column(BloomMightContain(GraftSql.expression(key), bloomBc))

  /** Convenience form: broadcasts the filter through the active session.
    * Prefer the Broadcast overload when the same filter serves many plans.
    */
  def apply(key: Column, bloom: BloomFilter): Column =
    apply(key, SparkSession.active.sparkContext.broadcast(bloom))
}
