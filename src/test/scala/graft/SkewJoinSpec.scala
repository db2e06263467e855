package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain inner join") {
    // 90% of probe rows share one hot key
    val probe = (1 to 1000).map(i => (if (i <= 900) 1 else i, s"p$i")).toDF("k", "pv")
    val build = Seq((1, "hot"), (950, "cold"), (2, "unmatched-on-probe... no 2? yes 2 absent")).toDF("bk", "bv")
    val plain = probe.join(build, probe("k") === build("bk"))
      .select("k", "pv", "bv").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInner(probe, build, "k", "bk", saltFactor = 8)
      .select("k", "pv", "bv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 901) // 900 hot + 1 cold
  }

  test("salt spreads the hot key across partitions") {
    val probe = (1 to 1000).map(i => (1, s"p$i")).toDF("k", "pv")
    val salts = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected hot key spread over >4 salts, got $salts")
  }

  test("hotKeys surfaces the skewed key") {
    val df = ((1 to 900).map(_ => 7) ++ (1 to 100)).toDF("k")
    val top = SkewJoin.hotKeys(df, col("k"), 1).collect().head
    assert(top.getInt(0) == 7 && top.getLong(1) == 901L) // 900 + the 7 in 1..100
  }
}
