package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query n times (default 3) against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Per-query time is the MIN
  * across runs (the first run pays one-time /tmp sink synthesis, JIT, and
  * shuffle-file warmup; min measures the query); `value` is the sum of
  * per-query mins, `median_total` the sum of medians.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup outside the timed region (JIT, codegen cache,
    // filesystem metadata) so per-query numbers measure the queries
    SparkEntry.entry(spark).count()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val failedRuns = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (_ <- 0 until n; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => failedRuns(name) += 1 }
      // time-to-failure is charged too: a query that starts crashing must
      // never make the headline total DECREASE (it is flagged, not dropped)
      times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
    }
    def min(xs: List[Double]): Double = xs.min
    def median(xs: List[Double]): Double = xs.sorted.apply(xs.size / 2)
    val failed = names.map(_._1).filter(k => failedRuns(k) == n)
    val mins = names.map { case (k, _) => k -> min(times(k)) }
    val qs = mins.map { case (k, v) =>
      s"\"" + k + "\":" + (if (failed.contains(k)) -1.0 else v)
    }.mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    val medianTotal = names.map { case (k, _) => median(times(k)) }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$n,"median_total":$medianTotal,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
