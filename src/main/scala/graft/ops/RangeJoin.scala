package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-aware range (interval) join: left rows matched to right rows with
  * `tsR` in `[tsL + lower, tsL + upper]` sharing an equi-key.
  *
  * Spark's optimizer turns a raw interval predicate into a broadcast
  * nested-loop (or cartesian) join — O(|L| x |R|) per key and a
  * non-starter at 100 TB. This operator BUCKETIZES time into
  * `upper - lower`-wide buckets: the left side explodes to the (at most
  * two) buckets its interval can touch, the right side lands in exactly
  * one, and the join becomes a plain shuffled equi-join on (key, bucket)
  * + a residual filter. Each true pair meets exactly once (the right
  * row's single bucket appears at most once in the left row's pair), so
  * no dedup pass is needed.
  */
object RangeJoin {

  /** @param lowerUs inclusive lower bound of `tsR - tsL` in microseconds
    * @param upperUs inclusive upper bound, `upperUs > lowerUs`
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lowerUs: Long,
      upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "upperUs must exceed lowerUs")
    val w = upperUs - lowerUs
    // bucket identity = the bucket's START (floor(c/w)*w), computed as
    // c - pmod(c, w): pure LONG arithmetic, exact for any sign. A
    // `floor(c / w)` quotient would divide as double and can misplace a
    // bucket once |c| exceeds 2^53 — the same hazard the ns->us paths
    // avoid with integer `div`.
    def bucket(c: Column): Column = c - pmod(c, lit(w))
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bkt",
        explode(array_distinct(array(
          bucket(col("__lus") + lowerUs), bucket(col("__lus") + upperUs)))))
    val r = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__bkt", bucket(col("__rus")))
    l.join(r,
        l(leftKey) === r(rightKey) && l("__bkt") === r("__bkt") &&
          col("__rus") >= col("__lus") + lowerUs &&
          col("__rus") <= col("__lus") + upperUs)
      .drop("__bkt", "__lus", "__rus")
  }

  /** Interval-OVERLAP join (range x range, the genomics / session-overlap
    * shape): rows sharing an equi-key whose CLOSED timestamp intervals
    * intersect (`lStart <= rEnd && rStart <= lEnd`).
    *
    * Same plan idea as [[intervalJoin]] — a raw overlap predicate plans as
    * a per-key nested loop — but both sides span multiple buckets, so each
    * side explodes to every `bucketUs`-wide bucket its interval touches
    * and a pair would meet once per SHARED bucket. The pair is therefore
    * emitted only in its CANONICAL bucket — the one containing the
    * overlap's start, `greatest(lStart, rStart)` — which every true pair
    * has exactly one of: no dedup pass, no distinct shuffle.
    *
    * Choose `bucketUs` near the typical interval length: the explode
    * factor is `len/bucketUs + 1` per row (a handful of narrow rows), and
    * too-wide buckets re-create per-bucket nested-loop pressure (or let
    * [[overlapJoinAutoBucket]] derive it from the data). Rows with
    * inverted intervals (end < start) are dropped.
    *
    * Beware open-ended sentinels: ONE row with a far-future end timestamp
    * explodes into `len/bucketUs` bucket rows and can push Spark's
    * `sequence()` past its element cap, failing the whole job with an
    * unhelpful error. `maxBucketsPerRow` is the opt-in guard: when set
    * below the default `Int.MaxValue`, rows spanning more buckets are
    * DROPPED — an explicit coverage bound (mirroring the
    * inverted-interval drop), logged when enabled, silent data loss if
    * you set it carelessly. Clamp sentinels before joining when those
    * rows must participate.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketUs: Long,
      maxBucketsPerRow: Int = Int.MaxValue): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(maxBucketsPerRow > 0, "maxBucketsPerRow must be positive")
    val capped = maxBucketsPerRow != Int.MaxValue
    if (capped) org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"overlapJoin: coverage bound maxBucketsPerRow=$maxBucketsPerRow — " +
        "rows whose interval spans more buckets are dropped")
    def bucket(c: Column): Column = c - pmod(c, lit(bucketUs))
    // the bound multiplies DRIVER-side with overflow detection: a wrapped
    // `bucketUs * maxBucketsPerRow` literal would go negative and
    // silently drop every row; an overflowing bound simply means
    // "uncapped" (no row can span 2^63 us)
    val boundUs: Long =
      try Math.multiplyExact(bucketUs, (maxBucketsPerRow - 1).toLong)
      catch { case _: ArithmeticException => Long.MaxValue }
    def spanOk(s: Column, e: Column): Column =
      if (!capped) lit(true)
      else bucket(e) - bucket(s) <= lit(boundUs)
    val l = left
      .withColumn("__lss", unix_micros(col(leftStart)))
      .withColumn("__les", unix_micros(col(leftEnd)))
      .filter(col("__lss") <= col("__les") && spanOk(col("__lss"), col("__les")))
      .withColumn("__bkt",
        explode(sequence(bucket(col("__lss")), bucket(col("__les")), lit(bucketUs))))
    val r = right
      .withColumn("__rss", unix_micros(col(rightStart)))
      .withColumn("__res", unix_micros(col(rightEnd)))
      .filter(col("__rss") <= col("__res") && spanOk(col("__rss"), col("__res")))
      .withColumn("__bkt",
        explode(sequence(bucket(col("__rss")), bucket(col("__res")), lit(bucketUs))))
    l.join(r,
        l(leftKey) === r(rightKey) && l("__bkt") === r("__bkt") &&
          col("__lss") <= col("__res") && col("__rss") <= col("__les") &&
          l("__bkt") === bucket(greatest(col("__lss"), col("__rss"))))
      .drop("__bkt", "__lss", "__les", "__rss", "__res")
  }

  /** [[overlapJoin]] with `bucketUs` derived FROM THE DATA: the 90th
    * percentile of interval lengths across both sides, via one cheap
    * scan-and-sketch job (`approx_percentile` — mergeable partial state,
    * no sort). A caller-guessed width goes stale the moment the data
    * shifts 100x; p90 keeps the explode factor bounded by construction —
    * at least ~90% of rows touch at most 2-3 buckets, the wider tail
    * explodes by `len/p90 + 1`, and `maxBucketsPerRow` still caps the
    * pathological sentinel rows. Join semantics are bucket-invariant, so
    * auto-tuning never changes the result set (beyond the documented
    * span cap) — only the plan's explode/selectivity trade-off.
    */
  def overlapJoinAutoBucket(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      maxBucketsPerRow: Int = 10000): DataFrame = {
    def lens(df: DataFrame, s: String, e: String) =
      df.select((unix_micros(col(e)) - unix_micros(col(s))).as("__len"))
        .filter(col("__len") >= 0)
    val p90Row = lens(left, leftStart, leftEnd)
      .unionByName(lens(right, rightStart, rightEnd))
      .agg(expr("approx_percentile(__len, 0.9)")).head()
    // empty inputs / all-empty intervals still need a positive width
    val bucketUs = if (p90Row.isNullAt(0)) 1L else math.max(p90Row.getLong(0), 1L)
    overlapJoin(left, right, leftKey, rightKey,
      leftStart, leftEnd, rightStart, rightEnd, bucketUs, maxBucketsPerRow)
  }
}
