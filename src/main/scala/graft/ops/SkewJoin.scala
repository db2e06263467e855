package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for heavily skewed keys (the explicit fallback when AQE
  * skew splitting isn't available — e.g. the skewed side feeds a window, or
  * the build side is too big to broadcast but small enough to replicate
  * `saltFactor` times).
  *
  * The skewed (probe) side gets a deterministic salt in [0, saltFactor)
  * derived from a hash of its whole row; the build side is replicated once
  * per salt value. The join key becomes (key, salt), splitting each hot key
  * across `saltFactor` reducers.
  */
object SkewJoin {

  def saltedInner(
      probe: DataFrame, // large, skewed side
      build: DataFrame, // smaller side, replicated saltFactor times
      probeKey: String,
      buildKey: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 1)
    val salted = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated,
        salted(probeKey) === replicated(buildKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Convenience: top-N hot keys by frequency — the measurement step before
    * deciding to salt (or to route hot keys through a broadcast join and
    * the rest through a shuffle join).
    */
  def hotKeys(df: DataFrame, key: Column, topN: Int): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
