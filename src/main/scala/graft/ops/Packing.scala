package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Sequence packing for training pipelines: lay documents end-to-end along a
  * global token axis and cut fixed-budget context windows ("concat and
  * chunk"). The core primitive is a GLOBAL EXCLUSIVE PREFIX SUM in a total
  * order — each document's starting offset in the packed token stream.
  *
  * Why not `sum(tokens).over(Window.orderBy(id))`: Spark plans an
  * un-partitioned window as a SINGLE-partition sort — the entire dataset
  * funnels through one task, which is exactly the plan that dies at 100 TB.
  * This operator keeps the data distributed with the classic two-pass
  * scheme:
  *
  *   1. range-repartition by the order key and sort within partitions
  *      (`repartitionByRange` assigns ascending key ranges to ascending
  *      partition ids, so partition-major order IS the global order);
  *   2. one small aggregate job collects each partition's subtotal —
  *      #partitions rows to the driver, bounded by cluster size, never by
  *      data size — and turns them into per-partition starting offsets;
  *   3. a `mapPartitions` pass adds a partition-local running sum to the
  *      broadcast offset (genuine per-partition imperative state — the
  *      documented last-resort case, and the only non-codegen step).
  *
  * The input is persisted (MEMORY_AND_DISK) between the two passes so the
  * range shuffle + sort run once; both entry points return a RELEASE
  * HANDLE for that cache — call it after the terminal action (unpersisting
  * the returned frame itself would be a no-op: its mapPartitions plan is
  * not `sameResult` with the persisted sorted plan).
  */
object Packing {

  /** Appends `outCol` = exclusive prefix sum of `valueCol` (cast to long,
    * nulls as 0) in ascending `orderCol` order. See object doc for the plan
    * shape and the release handle.
    *
    * `orderCol` must be a TOTAL order (unique values): with ties, the
    * offset split among tied rows is shuffle-arrival-dependent and can
    * differ between a run and a task retry — the retry-instability
    * [[Sampling]]'s scaladoc explains breaks exactly-once sinks. For a
    * non-unique sort key, encode a composite (key, uniqueId) into one
    * sortable column the way the length-sorted packing spec does.
    * `assertUniqueOrder = true` enforces that contract with one extra
    * aggregate over the already-persisted input (debug mode — catches the
    * misuse at the operator instead of as downstream offset flakiness).
    */
  def withExclusivePrefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String = "cum_excl",
      assertUniqueOrder: Boolean = false): (DataFrame, () => Unit) = {
    val (out, _, release) =
      withExclusivePrefixSumAndTotal(df, orderCol, valueCol, outCol, assertUniqueOrder)
    (out, release)
  }

  /** [[withExclusivePrefixSum]] plus the GRAND TOTAL of `valueCol` —
    * already known driver-side as the last prefix offset, so callers that
    * need it (e.g. `Sampling.shardAssign`'s `rank·n div total`) don't pay
    * a second full scan just to count.
    */
  def withExclusivePrefixSumAndTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String = "cum_excl",
      assertUniqueOrder: Boolean = false): (DataFrame, Long, () => Unit) = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val sorted = df
      .withColumn(valueCol, coalesce(col(valueCol).cast(LongType), lit(0L)))
      .repartitionByRange(par, col(orderCol))
      .sortWithinPartitions(orderCol)
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (assertUniqueOrder) {
      val dup = sorted.groupBy(col(orderCol)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).collect()
      if (dup.nonEmpty) {
        sorted.unpersist(blocking = false)
        throw new IllegalArgumentException(
          s"[Packing] orderCol '$orderCol' is not a total order: value " +
            s"'${dup.head.get(0)}' appears ${dup.head.getLong(1)} times — " +
            "encode a composite (key, uniqueId) sort column instead")
      }
    }

    // Pass 1: per-partition subtotals (a #partitions-row collect).
    val subtotals = sorted
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col(valueCol)).as("__sum"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = new Array[Long](par + 1)
    var i = 0
    while (i < par) { // empty partitions simply contribute 0
      offsets(i + 1) = offsets(i) + subtotals.getOrElse(i, 0L)
      i += 1
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // Pass 2: partition-local running sum on top of the broadcast offset.
    val schema = sorted.schema
    val valIdx = schema.fieldIndex(valueCol)
    val outSchema = schema.add(outCol, LongType, nullable = false)
    val out = sorted.mapPartitions { it =>
      var running = bcOffsets.value(TaskContext.getPartitionId())
      it.map { row =>
        val res = Row.fromSeq(row.toSeq :+ running)
        running += row.getLong(valIdx)
        res
      }
    }(Encoders.row(outSchema))
    (out, offsets(par), () => { sorted.unpersist(blocking = false); () })
  }

  /** Concat-and-chunk bin assignment: with documents laid end-to-end in
    * `orderCol` order, `bin` = which fixed-`budget` context window this
    * document STARTS in, and `crosses` = 1 when its tokens spill into the
    * next window (the fraction of boundary-crossing docs is the standard
    * packing-quality metric — minimizing it is why pipelines shuffle or
    * sort by length before packing).
    */
  def packBins(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      budget: Long,
      assertUniqueOrder: Boolean = false): (DataFrame, () => Unit) = {
    require(budget > 0, s"budget must be positive, got $budget")
    val (summed, release) =
      withExclusivePrefixSum(df, orderCol, tokensCol, assertUniqueOrder = assertUniqueOrder)
    val out = summed
      .withColumn("bin", expr(s"cum_excl div ${budget}L"))
      .withColumn(
        "crosses",
        when(
          col(tokensCol) > 0 &&
            expr(s"(cum_excl + $tokensCol - 1) div ${budget}L") =!= col("bin"),
          1L).otherwise(0L))
    (out, release)
  }
}
