package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("interval join matches inclusive bounds and crosses bucket boundaries") {
    // window [0s, 100s] after each left time; bucket width = 100s
    val left = Seq((1L, ts(50)), (2L, ts(50))).toDF("lk", "lt")
    val right = Seq(
      (1L, ts(50)),   // == lower bound: match
      (1L, ts(150)),  // == upper bound, in the NEXT 100s bucket: match
      (1L, ts(151)),  // just past upper: no match
      (1L, ts(49)),   // before lower: no match
      (2L, ts(120))   // other key, different bucket than its left row: match
    ).toDF("rk", "rt")
    val out = RangeJoin.intervalJoin(left, right, "lk", "rk", "lt", "rt",
        0L, 100L * 1000000)
      .select(col("lk"), col("rt")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000)).toSet
    assert(out == Set((1L, 50L), (1L, 150L), (2L, 120L)))
  }

  test("intervalJoin agrees with the naive theta join on random points, negative lower bound") {
    // a lower bound below zero exercises the signed bucket arithmetic
    // (c - pmod(c, w) must floor toward -inf for shifted negatives too)
    val rnd = new scala.util.Random(11)
    def mk(kc: String, tc: String) = (1 to 300)
      .map(_ => (rnd.nextInt(5).toLong, ts(rnd.nextInt(5000))))
      .toDF(kc, tc)
    val l = mk("lk", "lts")
    val r = mk("rk", "rts")
    val fast = RangeJoin.intervalJoin(l, r, "lk", "rk", "lts", "rts",
      -200L * 1000000, 300L * 1000000).count()
    val naive = l.join(r, col("lk") === col("rk") &&
      unix_micros(col("rts")) >= unix_micros(col("lts")) - 200000000L &&
      unix_micros(col("rts")) <= unix_micros(col("lts")) + 300000000L).count()
    assert(fast == naive && naive > 0)
  }

  test("each matching pair appears exactly once (no bucket double-count)") {
    val left = Seq((1L, ts(0))).toDF("lk", "lt")
    // right at ts(0): same bucket as both explored left buckets' range start
    val right = Seq((1L, ts(0)), (1L, ts(100))).toDF("rk", "rt")
    val out = RangeJoin.intervalJoin(left, right, "lk", "rk", "lt", "rt",
        0L, 100L * 1000000).collect()
    assert(out.length == 2) // one row per true pair, never duplicated
  }

  test("intervalJoin plan column hygiene: helper columns dropped") {
    val left = Seq((1L, ts(0))).toDF("lk", "lt")
    val right = Seq((1L, ts(10))).toDF("rk", "rt")
    val cols = RangeJoin.intervalJoin(left, right, "lk", "rk", "lt", "rt",
      0L, 100L * 1000000).columns.toSet
    assert(cols == Set("lk", "lt", "rk", "rt"))
  }

  test("overlapJoin: closed-interval semantics, exactly once across shared buckets") {
    // bucket width 100s; left interval [0, 250] spans 3 buckets
    val left = Seq((1L, ts(0), ts(250))).toDF("lk", "ls", "le")
    val right = Seq(
      (1L, ts(200), ts(400)),  // overlaps [200,250] across 2 shared buckets
      (1L, ts(250), ts(300)),  // touches at the closed endpoint: overlap
      (1L, ts(251), ts(300)),  // just past: no overlap
      (1L, ts(-100), ts(0)),   // touches at the other endpoint: overlap
      (2L, ts(0), ts(250))     // other key: no match
    ).toDF("rk", "rs", "re")
    val out = RangeJoin.overlapJoin(left, right, "lk", "rk",
        "ls", "le", "rs", "re", 100L * 1000000)
      .select(col("rs")).collect().map(_.getTimestamp(0).getTime / 1000).sorted.toSeq
    assert(out == Seq(-100L, 200L, 250L))
  }

  test("overlapJoin agrees with the naive theta join on random intervals") {
    val rnd = new scala.util.Random(7)
    def mk = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, { val s = rnd.nextInt(5000); (ts(s), ts(s + rnd.nextInt(400))) }))
      .map { case (k, (s, e)) => (k, s, e) }
    val l = mk.toDF("lk", "ls", "le")
    val r = mk.toDF("rk", "rs", "re")
    val fast = RangeJoin.overlapJoin(l, r, "lk", "rk", "ls", "le", "rs", "re",
      137L * 1000000).count()
    val naive = l.join(r, col("lk") === col("rk") &&
      col("ls") <= col("re") && col("rs") <= col("le")).count()
    assert(fast == naive && naive > 0)
  }

  test("overlapJoin opt-in cap drops a sentinel-wide interval instead of blowing up sequence()") {
    // end = start + ~100 years with 1-second buckets: ~3e9 buckets — far
    // past sequence()'s element cap. With the OPT-IN cap the row is
    // dropped (logged coverage bound), the rest of the join is unaffected.
    val wide = 100L * 365 * 24 * 3600
    val left = Seq((1L, ts(0), ts(250)), (1L, ts(0), ts(wide))).toDF("lk", "ls", "le")
    val right = Seq((1L, ts(200), ts(400))).toDF("rk", "rs", "re")
    val out = RangeJoin.overlapJoin(left, right, "lk", "rk",
      "ls", "le", "rs", "re", 1000000L, maxBucketsPerRow = 10000)
    assert(out.count() == 1) // only the narrow left row matches
    // with a cap big enough for the sentinel's span the row participates
    // again — the bound is a parameter, not a silent constant
    val roomier = RangeJoin.overlapJoin(left, right, "lk", "rk",
      "ls", "le", "rs", "re", wide * 1000000L / 2, maxBucketsPerRow = 10)
    assert(roomier.count() == 2)
    // a cap whose bucketUs product would overflow Long degrades to
    // "uncapped", never to drop-everything
    val hugeBuckets = RangeJoin.overlapJoin(left, right, "lk", "rk",
      "ls", "le", "rs", "re", Long.MaxValue / 4, maxBucketsPerRow = 100)
    assert(hugeBuckets.count() == 2)
  }

  test("overlapJoinAutoBucket matches the explicit-bucket result on mixed widths") {
    val rnd = new scala.util.Random(11)
    // 90% narrow (<= 60 s), 10% wide (~1 h) intervals: the p90-derived
    // bucket keeps the narrow mass at <= 2 buckets apiece
    def mk = (1 to 200).map { i =>
      val s = rnd.nextInt(50000)
      val len = if (i % 10 == 0) 3600 + rnd.nextInt(600) else rnd.nextInt(60)
      (rnd.nextInt(5).toLong, ts(s), ts(s + len))
    }
    val l = mk.toDF("lk", "ls", "le")
    val r = mk.toDF("rk", "rs", "re")
    val auto = RangeJoin.overlapJoinAutoBucket(l, r, "lk", "rk", "ls", "le", "rs", "re")
    val explicit = RangeJoin.overlapJoin(l, r, "lk", "rk", "ls", "le", "rs", "re",
      137L * 1000000)
    assert(auto.count() == explicit.count() && auto.count() > 0)
  }

  test("overlapJoin is a shuffled equi-join, not a nested loop") {
    val l = Seq((1L, ts(0), ts(100))).toDF("lk", "ls", "le")
    val r = Seq((1L, ts(50), ts(150))).toDF("rk", "rs", "re")
    val df = RangeJoin.overlapJoin(l, r, "lk", "rk", "ls", "le", "rs", "re",
      100L * 1000000)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p.take(1500))
  }
}
