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
}
