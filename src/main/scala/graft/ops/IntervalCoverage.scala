package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed interval-union coverage: total length of the UNION of a set
  * of half-open timestamp intervals `[start, end)` per group — "how many
  * microseconds of the day was at least one session of this type active?".
  *
  * The textbook sweep (sort by start, keep a running max of end, add each
  * interval's contribution past the running max) needs a GLOBAL sort per
  * group; as a Spark window that is `Window.partitionBy(group)` with an
  * unbounded ordering frame, which plans the whole group into ONE task —
  * a non-starter when one group holds a 100 TB-scale share of rows.
  *
  * This operator makes the sweep embarrassingly parallel by CLIPPING: time
  * is cut into `bucketUs`-wide buckets, each interval explodes to every
  * bucket it touches clipped to that bucket's boundaries (same
  * `sequence()`-explode shape as [[RangeJoin.overlapJoin]]). Clipped
  * pieces in different buckets are disjoint by construction, so
  *
  *   `|union(intervals)| = SUM over buckets of |union(pieces in bucket)|`
  *
  * exactly — no double counting, no boundary correction pass. The
  * per-bucket sweep is a window PARTITIONED BY (group, bucket): thousands
  * of independent partitions instead of one, each bounded by the bucket
  * width times the local interval density. Per-group totals are then one
  * hash aggregate.
  *
  * All arithmetic is 64-bit integer microseconds (`unix_micros`), so the
  * result is bit-exact and engine-portable. Inverted or empty intervals
  * (`end <= start`) are dropped up front — a group with NO valid
  * interval is therefore ABSENT from the result, not a zero row (left
  * join a group frame downstream if zero rows are wanted; scanning the
  * input a second time just for that default is not this operator's
  * job). The same
  * `maxBucketsPerRow` guard as [[RangeJoin.overlapJoin]] bounds the
  * explode factor of open-ended sentinel rows (opt-in, dropped rows are an
  * explicit coverage bound).
  */
object IntervalCoverage {

  /** @param df       input with timestamp columns `startCol`, `endCol`
    * @param groupCols grouping columns (coverage per distinct tuple)
    * @param bucketUs  bucket width in microseconds (choose near the typical
    *                  interval length; explode factor is `len/bucketUs + 1`)
    * @return one row per group: groupCols* , `covered_us` LONG
    */
  def coverage(
      df: DataFrame,
      groupCols: Seq[String],
      startCol: String,
      endCol: String,
      bucketUs: Long,
      maxBucketsPerRow: Int = Int.MaxValue): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(maxBucketsPerRow > 0, "maxBucketsPerRow must be positive")
    require(groupCols.nonEmpty, "at least one group column")
    val capped = maxBucketsPerRow != Int.MaxValue
    if (capped) org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"IntervalCoverage: coverage bound maxBucketsPerRow=$maxBucketsPerRow — " +
        "rows whose interval spans more buckets are dropped")
    // bucket identity = bucket start, pure LONG arithmetic (see
    // RangeJoin.intervalJoin on why not floor-divide through double)
    def bucket(c: Column): Column = c - pmod(c, lit(bucketUs))
    val boundUs: Long =
      try Math.multiplyExact(bucketUs, (maxBucketsPerRow - 1).toLong)
      catch { case _: ArithmeticException => Long.MaxValue }
    def spanOk(s: Column, e: Column): Column =
      if (!capped) lit(true) else bucket(e) - bucket(s) <= lit(boundUs)

    val pieces = df
      .withColumn("__s", unix_micros(col(startCol)))
      .withColumn("__e", unix_micros(col(endCol)))
      .filter(col("__s") < col("__e") && spanOk(col("__s"), col("__e") - 1))
      // half-open [s, e): the last bucket touched is the one containing
      // e-1, NOT e — an interval ending exactly on a boundary must not
      // emit an empty piece in the next bucket
      .withColumn("__bkt",
        explode(sequence(bucket(col("__s")), bucket(col("__e") - 1), lit(bucketUs))))
      .withColumn("__ps", greatest(col("__s"), col("__bkt")))
      .withColumn("__pe", least(col("__e"), col("__bkt") + bucketUs))

    // per-(group, bucket) sweep: running max of piece ends over the
    // preceding rows in (start, end) order; contribution is the part of
    // this piece past that running max (0 when fully covered)
    val w = Window
      .partitionBy((groupCols.map(col) :+ col("__bkt")): _*)
      .orderBy(col("__ps"), col("__pe"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val swept = pieces
      .withColumn("__cov", greatest(
        lit(0L),
        col("__pe") - greatest(col("__ps"), coalesce(max(col("__pe")).over(w), col("__ps")))))

    swept
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__cov")).as("covered_us"))
  }

  /** Distributed PEAK CONCURRENCY (max simultaneous intervals) per group —
    * the operational twin of [[coverage]], same clipping decomposition.
    * Within any bucket, the active count at every instant computed from
    * CLIPPED pieces equals the count from the original intervals (an
    * interval spanning the bucket contributes a piece starting at the
    * bucket boundary, so it is active from the first instant of the
    * bucket either way). Hence
    *
    *   `peak(group) = MAX over buckets of peak(pieces in bucket)`
    *
    * exactly, and the first instant the global peak is reached is the MIN
    * of the first-instant readouts over the buckets that attain it. The
    * per-bucket sweep (+1 at piece start, −1 at piece end, ends ordered
    * BEFORE starts at equal t — end-exclusive semantics) is a window
    * partitioned by (group, bucket): bounded partitions, never a global
    * per-group sort.
    *
    * @return one row per group: groupCols*, `peak` LONG,
    *         `peak_at_us` LONG (first instant the peak is reached)
    */
  def peakConcurrency(
      df: DataFrame,
      groupCols: Seq[String],
      startCol: String,
      endCol: String,
      bucketUs: Long,
      maxBucketsPerRow: Int = Int.MaxValue): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(maxBucketsPerRow > 0, "maxBucketsPerRow must be positive")
    require(groupCols.nonEmpty, "at least one group column")
    val capped = maxBucketsPerRow != Int.MaxValue
    if (capped) org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"IntervalCoverage: peak bound maxBucketsPerRow=$maxBucketsPerRow — " +
        "rows whose interval spans more buckets are dropped")
    def bucket(c: Column): Column = c - pmod(c, lit(bucketUs))
    val boundUs: Long =
      try Math.multiplyExact(bucketUs, (maxBucketsPerRow - 1).toLong)
      catch { case _: ArithmeticException => Long.MaxValue }
    def spanOk(s: Column, e: Column): Column =
      if (!capped) lit(true) else bucket(e) - bucket(s) <= lit(boundUs)

    val pieces = df
      .withColumn("__s", unix_micros(col(startCol)))
      .withColumn("__e", unix_micros(col(endCol)))
      .filter(col("__s") < col("__e") && spanOk(col("__s"), col("__e") - 1))
      .withColumn("__bkt",
        explode(sequence(bucket(col("__s")), bucket(col("__e") - 1), lit(bucketUs))))
      .withColumn("__ps", greatest(col("__s"), col("__bkt")))
      .withColumn("__pe", least(col("__e"), col("__bkt") + bucketUs))

    val gb = groupCols.map(col) :+ col("__bkt")
    // ±1 marks in ONE pass: a union of two selects over `pieces` would
    // re-execute the whole pieces subtree (scan + explode + any upstream
    // expression work) once per side — explode emits both marks per piece
    // from a single execution. Row set is identical to the union form.
    val marks = pieces
      .select((gb :+ explode(array(
        struct(col("__ps").as("__t"), lit(1L).as("__d")),
        struct(col("__pe").as("__t"), lit(-1L).as("__d")))).as("__m")): _*)
      .select((gb :+ col("__m.__t").as("__t") :+ col("__m.__d").as("__d")): _*)
    // default RANGE frame: peers at equal (t, d) aggregate together, so
    // the running value after all simultaneous starts is what peaks
    val w = Window.partitionBy(gb: _*).orderBy(col("__t"), col("__d"))
    val swept = marks.withColumn("__cur", sum(col("__d")).over(w))
    val perBucket = swept
      .withColumn("__bpeak", max(col("__cur")).over(Window.partitionBy(gb: _*)))
      .filter(col("__cur") === col("__bpeak"))
      .groupBy(gb: _*)
      .agg(max(col("__bpeak")).as("__bp"), min(col("__t")).as("__bt"))
    val gw = Window.partitionBy(groupCols.map(col): _*)
    perBucket
      .withColumn("__gp", max(col("__bp")).over(gw))
      .filter(col("__bp") === col("__gp"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__gp")).as("peak"), min(col("__bt")).as("peak_at_us"))
  }

  /** [[peakConcurrency]] with `bucketUs` derived from the p90 interval
    * length, exactly like [[coverageAutoBucket]] (peak is bucket-invariant,
    * so auto-tuning never changes the result — only the plan's balance).
    */
  def peakConcurrencyAutoBucket(
      df: DataFrame,
      groupCols: Seq[String],
      startCol: String,
      endCol: String,
      maxBucketsPerRow: Int = Int.MaxValue): DataFrame = {
    val lens = df.select(
      (unix_micros(col(endCol)) - unix_micros(col(startCol))).as("__len"))
      .filter(col("__len") > 0)
    val p90 = lens.select(expr("approx_percentile(__len, 0.9)")).head()
    val bucketUs =
      if (p90.isNullAt(0)) 1000000L
      else math.max(p90.getLong(0), 1000000L)
    peakConcurrency(df, groupCols, startCol, endCol, bucketUs, maxBucketsPerRow)
  }

  /** [[coverage]] with `bucketUs` derived FROM THE DATA: the p90 interval
    * length via one `approx_percentile` sketch pass (mergeable partial
    * state, no sort), clamped to ≥ 1 s. Same rationale as
    * [[RangeJoin.overlapJoinAutoBucket]]: a hard-coded width goes stale
    * when the data shifts 100x; p90 keeps the explode factor ~2-3 for at
    * least ~90% of rows by construction. Coverage is bucket-invariant, so
    * auto-tuning never changes the result — only the plan's balance.
    */
  def coverageAutoBucket(
      df: DataFrame,
      groupCols: Seq[String],
      startCol: String,
      endCol: String,
      maxBucketsPerRow: Int = Int.MaxValue): DataFrame = {
    val lens = df.select(
      (unix_micros(col(endCol)) - unix_micros(col(startCol))).as("__len"))
      .filter(col("__len") > 0)
    val p90 = lens.select(expr("approx_percentile(__len, 0.9)")).head()
    val bucketUs =
      if (p90.isNullAt(0)) 1000000L // empty input: any width, nothing explodes
      else math.max(p90.getLong(0), 1000000L)
    coverage(df, groupCols, startCol, endCol, bucketUs, maxBucketsPerRow)
  }
}
