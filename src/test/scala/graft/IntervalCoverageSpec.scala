package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.IntervalCoverage

class IntervalCoverageSpec extends SparkSpec {

  /** Build a one-group DataFrame of [s, e) second-offset intervals from a
    * fixed epoch base (timestamps keep the integer-us arithmetic exact). */
  private def df(iv: Seq[(Long, Long)], group: String = "g"): DataFrame = {
    import spark.implicits._
    val base = 1700000000000000L // 2023-11-14T22:13:20Z in us
    iv.toDF("s", "e")
      .select(lit(group).as("k"),
        timestamp_micros(lit(base) + col("s") * 1000000L).as("ts0"),
        timestamp_micros(lit(base) + col("e") * 1000000L).as("ts1"))
  }

  private def cov(d: DataFrame, bucketUs: Long): Map[String, Long] =
    IntervalCoverage.coverage(d, Seq("k"), "ts0", "ts1", bucketUs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Brute-force union length in whole seconds over small offsets. */
  private def naive(iv: Seq[(Long, Long)]): Long =
    iv.flatMap { case (s, e) => s until e }.distinct.size.toLong * 1000000L

  test("disjoint, nested, overlapping, and touching intervals") {
    // [0,10) u [20,30): 20 s. Buckets smaller, equal, larger than spans.
    for (b <- Seq(1000000L, 7000000L, 10000000L, 3600000000L)) {
      assert(cov(df(Seq((0L, 10L), (20L, 30L))), b) == Map("g" -> 20000000L), s"b=$b")
      // nested: [0,30) contains [5,10) — union is 30 s
      assert(cov(df(Seq((0L, 30L), (5L, 10L))), b) == Map("g" -> 30000000L), s"b=$b")
      // chain overlap [0,10) u [5,15) u [12,20) = [0,20)
      assert(cov(df(Seq((0L, 10L), (5L, 15L), (12L, 20L))), b) == Map("g" -> 20000000L), s"b=$b")
      // touching half-open [0,10) u [10,20) = [0,20), no double count, no gap
      assert(cov(df(Seq((0L, 10L), (10L, 20L))), b) == Map("g" -> 20000000L), s"b=$b")
    }
  }

  test("interval ending exactly on a bucket boundary emits no empty piece") {
    // end = 10 s with 10 s buckets: last touched bucket must be bucket 0
    assert(cov(df(Seq((0L, 10L))), 10000000L) == Map("g" -> 10000000L))
    // and one spanning exactly two buckets
    assert(cov(df(Seq((0L, 20L))), 10000000L) == Map("g" -> 20000000L))
  }

  test("inverted and empty intervals contribute nothing") {
    assert(cov(df(Seq((10L, 10L), (20L, 5L), (0L, 3L))), 1000000L) == Map("g" -> 3000000L))
  }

  test("groups are independent") {
    val d = df(Seq((0L, 10L)), "a").union(df(Seq((0L, 4L), (2L, 6L)), "b"))
    assert(cov(d, 3000000L) == Map("a" -> 10000000L, "b" -> 6000000L))
  }

  private def peak(d: DataFrame, bucketUs: Long): Map[String, (Long, Long)] =
    IntervalCoverage.peakConcurrency(d, Seq("k"), "ts0", "ts1", bucketUs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** Brute-force peak: active counts change only at interval starts, so
    * evaluating `count(s <= t < e)` at every distinct start covers all
    * candidates; first-at is the earliest attaining start. */
  private def naivePeak(iv: Seq[(Long, Long)]): (Long, Long) = {
    val base = 1700000000000000L
    val valid = iv.filter { case (s, e) => e > s }
    val counts = valid.map(_._1).distinct.sorted
      .map(t => t -> valid.count { case (s, e) => s <= t && t < e })
    val p = counts.map(_._2).max
    (p.toLong, base + counts.find(_._2 == p).get._1 * 1000000L)
  }

  test("peak concurrency: closed forms at every bucket width") {
    val base = 1700000000000000L
    for (b <- Seq(1000000L, 7000000L, 10000000L, 3600000000L)) {
      // disjoint: never more than 1 active, first at t=0
      assert(peak(df(Seq((0L, 10L), (20L, 30L))), b) ==
        Map("g" -> ((1L, base))), s"b=$b")
      // nested: 2 active from t=5
      assert(peak(df(Seq((0L, 30L), (5L, 10L))), b) ==
        Map("g" -> ((2L, base + 5000000L))), s"b=$b")
      // triple overlap at t=4
      assert(peak(df(Seq((0L, 10L), (2L, 8L), (4L, 6L))), b) ==
        Map("g" -> ((3L, base + 4000000L))), s"b=$b")
      // touching half-open: at t=10 the first interval is OVER (end
      // exclusive) — peak stays 1, first reached at t=0
      assert(peak(df(Seq((0L, 10L), (10L, 20L))), b) ==
        Map("g" -> ((1L, base))), s"b=$b")
    }
  }

  test("peak concurrency: boundary-spanning intervals neither double-count nor shift first-at") {
    val base = 1700000000000000L
    // both intervals span the 10 s bucket boundary; their bucket-1 pieces
    // both start AT the boundary — active count there is still 2, and the
    // global first-at must remain t=5 from bucket 0
    assert(peak(df(Seq((0L, 20L), (5L, 25L))), 10000000L) ==
      Map("g" -> ((2L, base + 5000000L))))
    // one interval across three buckets: peak 1 at t=0, not at a boundary
    assert(peak(df(Seq((0L, 30L))), 10000000L) == Map("g" -> ((1L, base))))
  }

  test("peak concurrency: bucketized equals brute force on random interval sets") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val iv = Seq.fill(60)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .map { case (a, b) => (a, a + (b % 23)) }
      val want = naivePeak(iv)
      for (b <- Seq(1000000L, 5000000L, 17000000L, 1000000000L)) {
        assert(peak(df(iv), b) == Map("g" -> want), s"trial=$trial b=$b")
      }
    }
  }

  test("peak concurrency: groups independent; auto-bucket matches explicit") {
    val base = 1700000000000000L
    val d = df(Seq((0L, 10L)), "a").union(df(Seq((0L, 4L), (2L, 6L)), "b"))
    assert(peak(d, 3000000L) ==
      Map("a" -> ((1L, base)), "b" -> ((2L, base + 2000000L))))
    val iv = Seq((0L, 7L), (3L, 20L), (40L, 41L), (100L, 160L), (150L, 155L))
    val got = IntervalCoverage
      .peakConcurrencyAutoBucket(df(iv), Seq("k"), "ts0", "ts1")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("g" -> naivePeak(iv)))
  }

  test("bucketized coverage equals brute force on random interval sets") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val iv = Seq.fill(60)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .map { case (a, b) => (a, a + (b % 23)) } // lengths 0..22 s, some empty
      val want = naive(iv.filter { case (s, e) => e > s })
      for (b <- Seq(1000000L, 5000000L, 17000000L, 1000000000L)) {
        assert(cov(df(iv), b) == Map("g" -> want), s"trial=$trial b=$b")
      }
    }
  }

  test("auto-bucket matches explicit buckets (coverage is bucket-invariant)") {
    val iv = Seq((0L, 7L), (3L, 20L), (40L, 41L), (100L, 160L), (150L, 155L))
    val want = naive(iv)
    val got = IntervalCoverage.coverageAutoBucket(df(iv), Seq("k"), "ts0", "ts1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g" -> want))
  }

  test("maxBucketsPerRow drops only over-spanning rows") {
    // sentinel [0, 100) at 10 s buckets spans 10 buckets; cap at 3 drops it
    val d = df(Seq((0L, 100L), (5L, 15L)))
    assert(IntervalCoverage.coverage(d, Seq("k"), "ts0", "ts1", 10000000L, 3)
      .collect().map(r => r.getLong(1)).toSeq == Seq(10000000L))
  }

  test("scale probe: 200k dense intervals match the single-sweep window result") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // deterministic congruential offsets: heavy overlap, many buckets
    val n = 200000
    val df = spark.range(n).select(
        (col("id") * 48271 % 997013).as("s0"),
        (col("id") * 16807 % 4001 + 1).as("len"))
      .select(lit("g").as("k"),
        timestamp_micros(col("s0") * 1000000L).as("ts0"),
        timestamp_micros((col("s0") + col("len")) * 1000000L).as("ts1"))
    val bucketized = IntervalCoverage.coverage(df, Seq("k"), "ts0", "ts1", 3600000000L)
      .head().getLong(1)
    // reference: textbook sweep as ONE window over the whole group (fine
    // at test scale; the operator exists to avoid exactly this at 100 TB)
    val w = Window.partitionBy("k").orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sweep = df.select(col("k"), unix_micros(col("ts0")).as("s"), unix_micros(col("ts1")).as("e"))
      .withColumn("cov", greatest(lit(0L),
        col("e") - greatest(col("s"), coalesce(max(col("e")).over(w), col("s")))))
      .agg(sum("cov")).head().getLong(0)
    assert(bucketized == sweep)
  }

  test("empty input yields empty result under auto-bucket") {
    val d = df(Seq.empty[(Long, Long)])
    assert(IntervalCoverage.coverageAutoBucket(d, Seq("k"), "ts0", "ts1").count() == 0L)
  }
}
