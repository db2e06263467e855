package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpora for ANN scale probes: `n`
  * vectors in `nClusters` well-separated blobs, generated DISTRIBUTED and
  * seed-free via xxhash64 (no driver-side arrays, no RNG state), so a 100k+
  * probe costs one projection, not a driver materialization.
  *
  * Vector i = center(i % nClusters) + noise(i) with centers uniform in
  * [-0.5, 0.5)^dim and noise uniform in [-noise/2, noise/2)^dim — at small
  * `noise` a vector's true nearest neighbors are its own blob, which makes
  * recall gates meaningful.
  */
object SyntheticVectors {

  private def u(salt: String, a: Column, b: Column): Column =
    pmod(xxhash64(lit(salt), a, b), lit(100000L)).cast("double") / 100000.0 - 0.5

  def clustered(
      spark: SparkSession, n: Int, dim: Int, nClusters: Int, noise: Double): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        u("c", pmod(col("id"), lit(nClusters)), j) + u("n", col("id"), j) * noise)
        .as("embedding"))
}
