package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, log}

/** THE repo cross-engine scaled-log formula, in one place:
  * `s(x) = floor(ln(x)·1e6 + 0.5)` as a long — the engine-agnostic
  * rounding every integer-log oracle (LM scoring, quality classifier,
  * BM25 idf, token entropy) builds on. Arguments must be >= 1 so the
  * value is finite. A precision or rounding change here must be mirrored
  * in every oracle SQL string; keeping one definition prevents the
  * operators from drifting apart.
  */
object ScaledLn {

  /** Driver-side scalar variant. */
  def long(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong

  /** Column variant — identical IEEE ops on the executors. */
  def column(c: Column): Column =
    floor(log(c) * 1e6 + 0.5).cast("long")
}
