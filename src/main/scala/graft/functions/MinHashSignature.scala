package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature from pre-hashed shingles: component i is
  * `min over h of mix_i(h)` where `mix_i` is the splitmix64 finalizer over
  * `h XOR seed_i` — Broder's min-wise independent permutation family,
  * approximated by 64-bit mixing (standard practice; e.g. Spark MLlib's
  * MinHashLSH uses the same hash-not-true-permutation approach).
  *
  * ONE pass over the hash array updates all `num` running minima — a
  * `transform(sequence(0,63), i -> array_min(transform(...)))` composition
  * would rescan (and under CollapseProject possibly re-COMPUTE) the shingle
  * pipeline per component, which is what made the naive version ~60x
  * slower. Wraparound arithmetic lives here in JVM code because ANSI mode
  * (Spark 4 default) makes SQL-level overflow an error.
  */
case class MinHashSignature(child: Expression, num: Int) extends UnaryExpression {
  require(num > 0 && num <= 1024)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<long> (shingle hashes), got $other")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSignature.compute(input.asInstanceOf[ArrayData], num))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSignature.compute($c, $num))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  // Deterministic per-component seeds (java.util.Random's LCG is spec-fixed).
  private val seeds: Array[Long] = {
    val rnd = new java.util.Random(0x5eed5eedL)
    Array.fill(1024)(rnd.nextLong())
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** One pass: for each shingle hash, update all `num` minima. */
  def compute(hashes: ArrayData, num: Int): Array[Long] = {
    val sig = Array.fill(num)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < num) {
        val v = splitmix64(h ^ seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  def apply(c: Column, num: Int): Column =
    GraftSql.column(MinHashSignature(GraftSql.expression(c), num))
}
