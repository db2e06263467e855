package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The TYPED aggregation surface (`Dataset[T]` + `Aggregator[IN, BUF,
  * OUT]`) — the API tier between built-in SQL aggregates and raw
  * `TypedImperativeAggregate` ([[graft.functions.VectorMean]]): compile-
  * time row types, codegen'd encoders, and full map-side partial
  * aggregation (reduce/merge), demonstrated with a quantity-weighted
  * price mean.
  *
  * Determinism note: the buffer carries integer CENTS (price exact to
  * 2 decimals in the testdata) and integer quantity, so partial sums are
  * associative-exact — the final division is the only floating op and
  * happens once per group, making results partition-order independent
  * and engine-portable.
  */
object TypedAgg {

  case class Item(flag: String, qty: Long, priceCents: Long)
  case class WSum(weightedCents: Long, qty: Long)

  /** Quantity-weighted mean price in cents (rounded down — integer
    * division, reproducible anywhere). */
  object WeightedPriceCents extends Aggregator[Item, WSum, Long] {
    override def zero: WSum = WSum(0L, 0L)
    override def reduce(b: WSum, a: Item): WSum =
      WSum(b.weightedCents + a.qty * a.priceCents, b.qty + a.qty)
    override def merge(b1: WSum, b2: WSum): WSum =
      WSum(b1.weightedCents + b2.weightedCents, b1.qty + b2.qty)
    override def finish(r: WSum): Long =
      if (r.qty == 0L) 0L else r.weightedCents / r.qty
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
