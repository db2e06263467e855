package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken's scheme,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
  * polynomial rolling hash over every `window`-char substring, fingerprint =
  * the minimum hash. Two documents sharing any `window`-length run are
  * likely to collide, which makes this a cheap near-dup blocking key.
  *
  * Implemented as a native Catalyst expression with `doGenCode` (not a UDF)
  * so it stays inside whole-stage codegen: one O(len) pass per document,
  * no per-row allocation.
  */
case class RollingHashFingerprint(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, "window must be positive")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_fingerprint requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(RollingHashFingerprint.compute(input.toString, window))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashFingerprint.compute($c.toString(), $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashFingerprint =
    copy(child = newChild)
}

object RollingHashFingerprint {
  private final val Base = 1000003L

  /** Min rolling hash over all `window`-char substrings (whole-string hash
    * when shorter). Karp-Rabin with wraparound multiplication.
    */
  def compute(s: String, window: Int): Long = {
    val n = s.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // base^(w-1) for the outgoing char
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + s.charAt(i); i += 1 }
    var min = h
    i = w
    while (i < n) {
      h = (h - s.charAt(i - w) * pow) * Base + s.charAt(i)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def apply(c: Column, window: Int): Column =
    GraftSql.column(RollingHashFingerprint(GraftSql.expression(c), window))
}
