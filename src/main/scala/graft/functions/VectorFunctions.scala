package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` columns using only
  * codegen'd builtins (`zip_with`/`aggregate`/`transform`) — no UDFs, no
  * driver-side math, scales linearly with rows (SURVEY.md north-star:
  * similarity search over an embedding column).
  *
  * All accumulation is sequential left-to-right in double precision, which
  * is exactly what the DuckDB oracle's list functions do — keeping
  * cross-engine results bit-comparable after rounding.
  */
object VectorFunctions {

  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Codegen'd one-pass cosine (see [[CosineSimilarity]]); same value as
    * `dot(a,b) / (norm(a) * norm(b))` bit-for-bit.
    */
  def cosineSimilarity(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Deterministic random hyperplanes for sign-LSH: `planes(seed, n, dim)`
    * is reproducible across JVMs (java.util.Random's LCG is part of its
    * spec), so bucketing is stable between runs and between executors.
    */
  def hyperplanes(seed: Long, nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket id: bit j = (v · plane_j) > 0. nPlanes <= 31.
    * Cosine-similar vectors collide with probability 1 - theta/pi per bit
    * (Charikar, STOC'02 SimHash), so same-bucket candidates are
    * near-neighbors with tunable recall via nPlanes / multi-table OR-ing.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    require(planes.length <= 31, "bucket packed into an int")
    planes.zipWithIndex.map { case (p, j) =>
      val planeLit = typedlit(p.toSeq)
      when(dot(vec, planeLit) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  // ------------------------------------------------- int8 quantization

  /** Symmetric int8 scale for a (double-array) vector: max|x| / 127, the
    * standard per-vector scalar quantization used to cut embedding storage
    * 4x before ANN indexing. max is order-independent, so the scale is
    * deterministic under any partitioning.
    */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0

  /** Quantized codes: floor(x/scale + 0.5) — round-half-up via the same
    * floor formula the oracle uses, NOT round(), whose half-boundary
    * behavior differs between Spark (BigDecimal HALF_UP) and DuckDB
    * (binary multiply). Codes stay in [-127, 127]; a zero vector (scale 0)
    * quantizes to all zeros.
    */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale > 0, floor(x / scale + 0.5)).otherwise(lit(0.0)).cast("long"))

  /** Sum of squared reconstruction errors for codes `q` at `scale` against
    * the original vector — a sequential left fold in doubles, matching the
    * oracle's list-ordered accumulation (see object doc). Callers scale to
    * an integer before cross-row aggregation: double SUMS across rows are
    * partition-order dependent, scaled-long sums are exact and associative.
    */
  def int8SqError(vec: Column, q: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, q, (x, c) => (x - c * scale) * (x - c * scale)),
      lit(0.0), (acc, v) => acc + v)
}
